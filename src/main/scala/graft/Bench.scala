package graft

import graft.changegen.{ChangeGen, FeedConfig}
import graft.merge.{MergeConfig, MergeInto}
import graft.table.LakeTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Benchmark main. Two phases:
  *
  * 1. CDC MERGE throughput (the BASELINE.json metric): replay a
  *    deterministic change feed through the MERGE kernel at TWO parallelism
  *    levels — local[8] and local[32] — on identical input, reporting
  *    events/sec at each and the scaling efficiency
  *    (rate32/rate8)/(32/8). This is the sandbox evidence for the
  *    north-rule two-cluster-size criterion (no real cluster here).
  *    A warm-up replay precedes each timed run (JIT + codegen warm-up,
  *    the reference's 20-call warm-up pattern,
  *    ClusterClientServiceImpl.java:70-80).
  *    A Zipf-skewed feed variant shows the salted dedupe holding
  *    throughput under hot keys.
  *
  * 2. Headline operator queries on SPARK_GRAFT_SF_DIR, one wall-clock
  *    second figure each.
  *
  * Prints ONE JSON line:
  * {"metric":...,"value":<total query sec>,"unit":"sec","queries":{...},
  *  "sf":...,"cdc":{...}}
  */
object Bench {

  private def newSession(cpus: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Replay every segment of a feed phase dir through MergeInto; returns
    * wall seconds.
    */
  private def replay(spark: SparkSession, phaseDir: String, tableDir: String,
      checkpointId: String, cfg: MergeConfig): Double = {
    val segs = spark.read.parquet(phaseDir).select("seg").distinct()
      .collect().map(_.get(0).toString.toLong).sorted
    val t0 = System.nanoTime()
    segs.foreach { seg =>
      val batch = spark.read.parquet(phaseDir)
        .filter(col("seg") === seg).drop("seg")
      MergeInto.apply(spark, LakeTable(tableDir), batch, checkpointId, seg, cfg)
    }
    (System.nanoTime() - t0) / 1e9
  }

  private def log(msg: String): Unit = System.err.println(s"[bench] $msg")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nEvents = sys.env.getOrElse("SPARK_GRAFT_BENCH_EVENTS", "4000000").toLong
    // "all" | "cdc" (skip query phase) | "queries" (skip CDC phase)
    val mode = sys.env.getOrElse("SPARK_GRAFT_BENCH_MODE", "all")
    val work = java.nio.file.Files.createTempDirectory("graft-bench").toString

    // ---- phase 1: CDC merge throughput at two parallelism levels ------
    val nSegments = sys.env.getOrElse("SPARK_GRAFT_BENCH_SEGMENTS", "8").toInt
    val feedCfg = FeedConfig(numEvents = nEvents, numKeys = (nEvents / 40).toInt.max(1000),
      seed = 42, deleteFraction = 0.05, dupFraction = 0.02,
      outOfOrderWindow = 10000, eventsPerSegment = (nEvents / nSegments).max(1))
    val warmCfg = feedCfg.copy(numEvents = nEvents / 20,
      eventsPerSegment = (nEvents / 40).max(1))
    val skewCfg = feedCfg.copy(zipf = 1.1)
    val mergeCfg = MergeConfig(
      numBuckets = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUCKETS", "32").toInt,
      saltFactor = sys.env.getOrElse("SPARK_GRAFT_BENCH_SALT", "0").toInt,
      broadcastThreshold =
        sys.env.getOrElse("SPARK_GRAFT_BENCH_BCAST", "2000000").toLong)

    var rate8, sec8, rateN, secN, efficiency, skewRate = 0.0
    if (mode != "queries") {
      // generate feeds once (deterministic content; generation not timed)
      locally {
        val s = newSession(cpus)
        log(s"generating feeds ($nEvents events) ...")
        ChangeGen.writeFeed(s, s"$work/feed", feedCfg)
        ChangeGen.writeFeed(s, s"$work/feed-warm", warmCfg)
        ChangeGen.writeFeed(s, s"$work/feed-skew", skewCfg)
        s.stop()
      }

      val rates = Seq(8, cpus).distinct.map { level =>
        val s = newSession(level)
        log(s"local[$level] warm-up replay ...")
        replay(s, s"$work/feed-warm/phase=0", s"$work/t-warm-$level", s"warm$level", mergeCfg)
        log(s"local[$level] timed replay ...")
        val sec = replay(s, s"$work/feed/phase=0", s"$work/t-$level", s"cdc$level", mergeCfg)
        s.stop()
        log(f"local[$level]: $sec%.1f s = ${nEvents / sec}%.0f events/s")
        level -> ((nEvents / sec, sec))
      }.toMap

      rate8 = rates(8)._1; sec8 = rates(8)._2
      rateN = rates(cpus)._1; secN = rates(cpus)._2
      efficiency =
        if (cpus == 8) 1.0 else (rateN / rate8) / (cpus.toDouble / 8.0)

      // skew sensitivity at the high level
      skewRate = {
        val s = newSession(cpus)
        log("zipf-skew replay ...")
        val sec = replay(s, s"$work/feed-skew/phase=0", s"$work/t-skew", "skew", mergeCfg)
        s.stop()
        nEvents / sec
      }
    }

    // ---- phase 2: headline operator queries ---------------------------
    val queryTimes = if (mode == "cdc") Seq.empty else {
      val s = newSession(cpus)
      val ts = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { fn(s, sfDir).count(); true }
        catch { case _: Throwable => false }
        val dt = (System.nanoTime() - t0) / 1e9
        log(f"query $name: $dt%.2f s${if (ok) "" else " FAILED"}")
        name -> (if (ok) dt else -1.0)
      }
      s.stop()
      ts
    }

    val total = queryTimes.map(_._2).filter(_ >= 0).sum
    def f(d: Double) = f"$d%.3f"
    val qs = queryTimes.map { case (k, v) => s""""$k":${f(v)}""" }.mkString("{", ",", "}")
    val cdc =
      s"""{"events":$nEvents,"events_per_sec_local8":${f(rate8)},""" +
        s""""events_per_sec_local$cpus":${f(rateN)},""" +
        s""""sec_local8":${f(sec8)},"sec_local$cpus":${f(secN)},""" +
        s""""scaling_efficiency_8_to_$cpus":${f(efficiency)},""" +
        s""""events_per_sec_zipf1.1_local$cpus":${f(skewRate)}}"""
    println(s"""{"metric":"graft cdc merge throughput (events/sec, local[8] vs local[$cpus]) + operator query times","value":${f(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","cdc":$cdc}""")
  }
}
