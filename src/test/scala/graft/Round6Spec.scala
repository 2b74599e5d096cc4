package graft

import graft.changegen.{ChangeGen, FeedConfig, Phase, RawEvent}
import graft.functions.Fns
import graft.merge.{MergeConfig, MergeInto}
import graft.table.LakeTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-6 optimization equivalence gates: every operator whose internals
  * were restructured for performance proves here that its results are
  * unchanged.
  */
class Round6Spec extends SparkSpec {
  import spark.implicits._

  private def batchDf(events: Seq[RawEvent]): DataFrame =
    ChangeGen.projectPhase(events.toDF(),
      Phase(0, Long.MaxValue)).drop("seg")

  test("shingleHashes == xxhash64 over the shingles column, order included") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "  Tabs\tand\nnewlines   collapse  into spaces badly  "),
      (4L, "short one"), // fewer than 3 words -> no shingles
      (5L, ""),
      (6L, "dup dup dup dup dup dup"), // repeated shingles -> distinct once
      (7L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val both = docs.select(
      Fns.shingleHashes(col("text"), 3).as("fast"),
      transform(Fns.shingles(col("text"), 3), s => xxhash64(s)).as("ref"))
      .collect()
    both.foreach { r =>
      val fast = r.getSeq[Long](0)
      // null text: shingles yields null (size(null) CASE), the UDF yields
      // an empty array — both explode to zero rows downstream
      if (r.isNullAt(1)) assert(fast.isEmpty)
      else assert(fast === r.getSeq[Long](1))
    }
  }

  test("statusCounts gating: same table state; counters exact iff opted in") {
    val feed = FeedConfig(numEvents = 4000, numKeys = 150, seed = 11,
      deleteFraction = 0.1, dupFraction = 0.1, eventsPerSegment = 2000)
    val events = ChangeGen.generateLocal(feed)
    val segs = events.groupBy(_.seg).toSeq.sortBy(_._1)

    def run(cfg: MergeConfig, dir: String) = {
      val table = LakeTable(dir)
      val lineage = segs.flatMap { case (seg, evs) =>
        MergeInto.apply(spark, table, batchDf(evs), "cp", seg, cfg).lineage
      }
      (table.read(spark).orderBy("doc_id").collect().toSeq, lineage)
    }

    val (stateOff, linOff) = run(MergeConfig(numBuckets = 4), tmpDir("r6-off"))
    val (stateOn, linOn) =
      run(MergeConfig(numBuckets = 4, statusCounts = true), tmpDir("r6-on"))

    assert(stateOff === stateOn) // the optimization must not touch results
    // LSN ranges are exact either way (pre-pass stats, no read-back job)
    assert(linOff.map(l => (l.batch_id, l.partition, l.min_lsn, l.max_lsn)) ===
      linOn.map(l => (l.batch_id, l.partition, l.min_lsn, l.max_lsn)))
    // counters: -1 sentinels without the opt-in, real values with it
    assert(linOff.forall(l => l.n_insert == -1L && l.n_update == -1L &&
      l.n_delete == -1L && l.n_dedup_dropped == -1L))
    assert(linOn.exists(_.n_insert > 0L))
    assert(linOn.forall(l => l.n_insert >= 0L && l.n_update >= 0L &&
      l.n_delete >= 0L && l.n_dedup_dropped >= 0L))
  }
}
