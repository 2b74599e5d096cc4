package graft.tools

import graft.SparkEntry
import graft.merge.{MergeConfig, MergeInto}
import graft.table.LakeTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Capture the MERGE kernel's per-batch WRITE plans for the committed
  * plan artifacts (plans/r06): the catalog's CDC queries are imperative
  * multi-batch drivers, so their returned DataFrame's explain shows only
  * the final table read — the restructured plans live inside each batch.
  * This tool replays the same sf feed through the kernel twice per path
  * (default config = round-6 single-task shape; `singleTaskRows = 0` =
  * the previous parallel shape) and dumps the retained write plans.
  *
  * usage: runMain graft.tools.MergePlanCapture <plansDir> [sfDir] [cpus]
  */
object MergePlanCapture {
  def main(args: Array[String]): Unit = {
    val plansDir = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(2).map(_.toInt).getOrElse(32)
    System.setProperty("graft.merge.explain", "1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val changes = SparkEntry.cdcChanges(spark, sfDir).persist()
    val work = java.nio.file.Files.createTempDirectory("graft-plan-cap").toString

    def dump(name: String, plan: Option[String]): Unit = {
      val p = java.nio.file.Paths.get(plansDir, s"$name.txt")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, plan.getOrElse("<no plan captured>"))
      println(s"[plan-capture] -> $p")
    }

    /** Replay 2 rewrite-path batches (bootstrap + merge-into-existing) and
      * return the SECOND batch's write plan (the steady-state shape).
      */
    def rewritePlan(tag: String, cfg: MergeConfig): Option[String] = {
      val table = LakeTable(s"$work/t-$tag")
      (0L until 2L).foreach { b =>
        MergeInto.lastWritePlan = None
        MergeInto.apply(spark, table, changes.filter(col("lsn") % 4 === b),
          tag, b, cfg)
      }
      MergeInto.lastWritePlan
    }

    /** Bootstrap + one delta-append batch; return the delta batch's plan. */
    def deltaPlan(tag: String, cfg: MergeConfig): Option[String] = {
      val table = LakeTable(s"$work/t-$tag")
      (0L until 2L).foreach { b =>
        MergeInto.lastWritePlan = None
        MergeInto.apply(spark, table, changes.filter(col("lsn") % 16 === b),
          tag, b, cfg.copy(deltaAppendThreshold = 10000000L))
      }
      MergeInto.lastWritePlan
    }

    dump("merge_batch_small_after",
      rewritePlan("after", MergeConfig(numBuckets = 8)))
    dump("merge_batch_small_before",
      rewritePlan("before", MergeConfig(numBuckets = 8, singleTaskRows = 0L)))
    dump("merge_delta_batch_after",
      deltaPlan("dafter", MergeConfig(numBuckets = 8)))
    dump("merge_delta_batch_before",
      deltaPlan("dbefore", MergeConfig(numBuckets = 8, singleTaskRows = 0L)))

    changes.unpersist()
    graft.util.IoUtil.deleteRecursively(new java.io.File(work))
    spark.stop()
  }
}
