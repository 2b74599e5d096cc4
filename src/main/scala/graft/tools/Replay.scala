package graft.tools

import graft.changegen.{ChangeGen, FeedConfig}
import graft.merge.{MergeConfig, MergeInto}
import graft.stream.{CdcStream, StreamConfig}
import graft.table.LakeTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CLI driver: generate a deterministic change feed, replay it through the
  * MERGE kernel into a LakeTable, print lineage and final-state summary.
  * The operational entry point for demos and manual runs:
  *
  * {{{
  *   sbt "runMain graft.tools.Replay <workDir> [numEvents] [numKeys] [zipf] [mode]"
  * }}}
  *
  * mode = `batch` (default; explicit per-segment MERGE calls) or `stream`
  * (Structured Streaming tail with checkpoint, Trigger.AvailableNow).
  */
object Replay {
  def main(args: Array[String]): Unit = {
    val workDir = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-replay").toString)
    val numEvents = args.lift(1).map(_.toLong).getOrElse(100000L)
    val numKeys = args.lift(2).map(_.toInt).getOrElse(5000)
    val zipf = args.lift(3).map(_.toDouble).getOrElse(0.0)
    val mode = args.lift(4).getOrElse("batch")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-replay")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val feedDir = s"$workDir/feed"
    val tableDir = s"$workDir/table"
    val nSegments = sys.env.get("GRAFT_REPLAY_SEGMENTS").map(_.toInt).getOrElse(8)
    val cfg = FeedConfig(numEvents = numEvents, numKeys = numKeys, zipf = zipf,
      deleteFraction = 0.05, dupFraction = 0.02, outOfOrderWindow = 1000,
      eventsPerSegment = math.max(numEvents / nSegments, 1))
    println(s"[replay] writing feed: $cfg -> $feedDir")
    val phaseDirs = ChangeGen.writeFeed(spark, feedDir, cfg)

    val table = LakeTable(tableDir)
    // GRAFT_REPLAY_DELTA=<rows>: batches at or under the threshold take
    // the merge-on-read append path (trickle-ingest shape); GRAFT_REPLAY_
    // SEGMENTS overrides the batch count for trickle experiments
    val deltaThreshold =
      sys.env.get("GRAFT_REPLAY_DELTA").map(_.toLong).getOrElse(0L)
    val mergeCfg = MergeConfig(numBuckets = 16,
      lineageDir = Some(s"$workDir/lineage"),
      deltaAppendThreshold = deltaThreshold)
    var applied = 0L
    if (mode == "stream") phaseDirs.zipWithIndex.foreach { case (phaseDir, i) =>
      CdcStream.runToCompletion(spark, StreamConfig(
        feedDir = phaseDir, tableDir = tableDir,
        checkpointDir = s"$workDir/checkpoint-$i", checkpointId = s"cdc-$i",
        maxFilesPerTrigger = 2, merge = mergeCfg),
        (id, res) => println(f"[replay] stream batch=$id%3d -> " +
          f"snapshot=${res.snapshotId.take(8)} v${res.version} " +
          f"insert=${res.lineage.map(_.n_insert).sum} " +
          f"update=${res.lineage.map(_.n_update).sum} " +
          f"delete=${res.lineage.map(_.n_delete).sum} skipped=${res.skipped}"))
    }
    else phaseDirs.foreach { phaseDir =>
      // `seg` comes back type-inferred from the partition directory name
      val segs = spark.read.parquet(phaseDir).select("seg").distinct()
        .collect().map(_.get(0).toString.toLong).sorted
      segs.foreach { seg =>
        val batch = spark.read.parquet(phaseDir)
          .filter(col("seg") === seg).drop("seg")
        val n = batch.count()
        val res = MergeInto.apply(spark, table, batch, "replay-cli", seg, mergeCfg)
        applied += n
        val ins = res.lineage.map(_.n_insert).sum
        val upd = res.lineage.map(_.n_update).sum
        val del = res.lineage.map(_.n_delete).sum
        val dup = res.lineage.map(_.n_dedup_dropped).sum
        println(f"[replay] batch=$seg%3d rows=$n%8d -> snapshot=${res.snapshotId.take(8)} " +
          f"v${res.version} insert=$ins update=$upd delete=$del dedup_dropped=$dup skipped=${res.skipped}")
      }
    }
    if (sys.env.get("GRAFT_REPLAY_COMPACT").contains("1")) {
      val tombs = table.readStored(spark).filter(col("_tombstone")).count()
      val res = graft.table.Maintenance.compact(spark, table,
        tombstoneWatermark = Long.MaxValue - 1)
      val orphans = graft.table.Maintenance.vacuum(table, res.version)
      println(s"[replay] compacted: files ${res.filesBefore} -> ${res.filesAfter}, " +
        s"tombstones GC'd: $tombs, orphan files vacuumed: ${orphans.size}")
    }
    val finalState = table.read(spark)
    val m = table.currentManifest()
    if (m.version > 0)
      println(s"[replay] time travel: v0 had ${table.readVersion(spark, 0).count()} " +
        s"surviving rows vs v${m.version} now")
    // only the batch path counts raw rows driver-side; the stream path's
    // per-batch lines above carry the applied counts (printing the
    // never-incremented counter there read as "applied: 0")
    if (mode != "stream") println(s"[replay] feed rows applied: $applied")
    println(s"[replay] final snapshot: ${m.snapshotId} (version ${m.version}, " +
      s"${table.filesOf(m).size} files, ${m.ledger.size} ledger entries)")
    println(s"[replay] surviving rows: ${finalState.count()}")
    finalState.orderBy("doc_id").show(5, truncate = 60)
    spark.stop()
  }
}
