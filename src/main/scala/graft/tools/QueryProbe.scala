package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Time a single catalog query by name — the per-query iteration loop the
  * full `graft.Bench` query phase is too coarse for. Combine with
  * GRAFT_MERGE_TIMING=1 to decompose a CDC query's per-batch phases.
  *
  * usage: runMain graft.tools.QueryProbe <name> [sfDir] [reps] [cpus]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = args.lift(3).map(_.toInt).getOrElse(32)
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"no such query: $name (have ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")})"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[probe] $name rep$r: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
