package graft

import graft.changegen.{ChangeGen, Phase, RawEvent}
import graft.merge.{MergeConfig, MergeInto}
import graft.model.Ops
import graft.table.{LakeTable, Maintenance}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-3 regression: the compact/ledger-floor exactly-once intersection.
  *
  * After ledger retention folds old batches into the manifest's batch
  * floor, that floor is the ONLY record those batches committed. A
  * compaction that also GCs tombstones MUST carry the floor forward:
  * otherwise a replayed pre-floor batch re-applies and a delete that was
  * just tombstone-GC'd gets resurrected by its own original insert.
  */
class CompactFloorSpec extends SparkSpec {
  import spark.implicits._

  private def batchDf(events: Seq[RawEvent]): DataFrame =
    ChangeGen.projectPhase(events.toDF(), Phase(0, Long.MaxValue)).drop("seg")

  private def ev(lsn: Long, key: String, op: String, tok: Array[Int]) =
    RawEvent(lsn, key, op, tok, if (tok == null) -1 else tok.length, "s", null, 0)

  test("compact preserves the ledger batch floor: pre-floor replay cannot resurrect a deleted key") {
    val work = tmpDir("lake-compact-floor")
    val table = LakeTable(s"$work/t")
    val cfg = MergeConfig(numBuckets = 2, ledgerRetention = 2)
    // batch 0: insert k at lsn 5; batch 1: delete k at lsn 9;
    // batches 2..5: unrelated keys — retention 2 folds batches 0..3 into
    // the floor (floorBatch = cp -> 3)
    val batches: Seq[Seq[RawEvent]] =
      Seq(Seq(ev(5, "k", Ops.Insert, Array(5))),
        Seq(ev(9, "k", Ops.Delete, null))) ++
        (2 to 5).map(b => Seq(ev(100L + b, s"other$b", Ops.Insert, Array(b))))
    batches.zipWithIndex.foreach { case (evs, b) =>
      MergeInto.apply(spark, table, batchDf(evs), "cp", b.toLong, cfg)
    }
    val before = table.currentManifest()
    assert(before.floorBatch.getOrElse("cp", -1L) >= 1L,
      s"precondition: the delete batch must be below the floor, got ${before.floorBatch}")

    // compact with watermark past every applied LSN: k's tombstone is GC'd
    Maintenance.compact(spark, table, tombstoneWatermark = 1000L)
    assert(table.readStored(spark).filter(col(MergeInto.TOMBSTONE)).count() === 0)
    val after = table.currentManifest()
    assert(after.floorBatch === before.floorBatch,
      "compact must carry the ledger batch floor forward")

    // replay the below-floor insert batch (checkpoint reset / secondary
    // writer): must be recognized as committed and skipped — NOT re-applied
    val r = MergeInto.apply(spark, table, batchDf(batches.head), "cp", 0L, cfg)
    assert(r.skipped, "pre-floor batch replay must be a ledger no-op")
    assert(table.read(spark).filter(col("doc_id") === "k").count() === 0,
      "deleted key must stay deleted after compact + pre-floor replay")
    assert(table.read(spark).count() === 4)
  }
}
