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

  /** Sign-bit bucket of `v` under `planes` random hyperplanes — the
    * native codegen'd expression
    * ([[graft.functions.expressions.HyperplaneBucket]]). The previous
    * `aggregate`/`zip_with`-per-plane Column formulation evaluated
    * planes x dim interpreted higher-order calls per row (the pattern
    * measured ~80x slower on cosine); [[hyperplaneBucketColumns]] keeps
    * it for the parity test.
    */
  def hyperplaneBucket(v: Column, planes: Int, seed: Long, dim: Int): Column =
    graft.functions.Registry.hyperplaneBucket(v, planes, seed, dim)

  /** Interpreted reference formulation of [[hyperplaneBucket]] (identical
    * component function and bit packing); used to cross-check the native
    * expression.
    */
  private[graft] def hyperplaneBucketColumns(
      v: Column, planes: Int, seed: Long, dim: Int): Column = {
    require(planes <= 63, "at most 63 hyperplanes")
    import graft.functions.expressions.HyperplaneBucket.component
    val bits = (0 until planes).map { p =>
      val comps = array((0 until dim).map(d => lit(component(p, d, seed))): _*)
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
