package graft.operators

import graft.functions.Fns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Brute-force cosine top-k is the correctness baseline;
  * random-hyperplane LSH bucketing is the scale path (candidate set
  * shrinks by ~2^planes; recall traded via multi-probe of neighboring
  * buckets).
  */
object Ann {

  /** Deterministic pseudo-random hyperplane component for (seed, plane p,
    * dimension d): a zero-mean value derived from xxhash64 — broadcast-free
    * and identical on every executor.
    */
  private def planeComponent(p: Int, d: Int, seed: Long): Double = {
    // splitmix-style mix, mapped to [-0.5, 0.5)
    var x = seed + p.toLong * 0x9e3779b97f4a7c15L + d.toLong * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x = x ^ (x >>> 31)
    ((x >>> 11).toDouble / (1L << 53).toDouble) - 0.5
  }

  /** Sign-bit bucket of `v` under `planes` random hyperplanes. Pure column
    * expression (no UDF): dot product per plane via `aggregate`, sign bits
    * packed into a long.
    */
  def hyperplaneBucket(v: Column, planes: Int, seed: Long, dim: Int): Column = {
    require(planes <= 63, "at most 63 hyperplanes")
    val bits = (0 until planes).map { p =>
      val comps = array((0 until dim).map(d => lit(planeComponent(p, d, seed))): _*)
      val dot = aggregate(zip_with(v, comps, (x, c) => x.cast("double") * c),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Brute-force cosine top-k: every query joined against the full corpus.
    * O(|q| * n) — exact, the oracle for the LSH variant; also the right
    * tool when |q| is small and the corpus is broadcastable per partition.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        Fns.cosine(col("qv"), col("cv")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("sim", round(col("sim"), 4))
  }

  /** LSH-bucketed ANN: corpus and queries hashed to hyperplane buckets;
    * candidates = corpus rows in any probed bucket (the query's bucket
    * plus single-bit flips up to `probes`), exact cosine re-rank inside.
    * Recall < 1 by construction; verified against brute force in tests.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      planes: Int = 8, probes: Int = 2, seed: Long = 42L, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cv"))
      .withColumn("bucket", hyperplaneBucket(col("cv"), planes, seed, dim))
    // multi-probe: original bucket + all single-bit flips (probes>=1), as
    // an exploded probe list -> the join stays a hash join on bucket
    val probeBuckets: Column => Column = b =>
      if (probes <= 1) array(b)
      else array(b +: (0 until planes).map(p => b.bitwiseXOR(lit(1L << p))): _*)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qbucket", hyperplaneBucket(col("qv"), planes, seed, dim))
      .select(col("query_id"), col("qv"),
        explode(probeBuckets(col("qbucket"))).as("bucket"))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        Fns.cosine(col("qv"), col("cv")).as("sim"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("sim", round(col("sim"), 4))
  }
}
