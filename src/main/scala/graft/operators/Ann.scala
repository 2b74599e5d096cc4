package graft.operators

import graft.functions.Fns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Brute-force cosine top-k is the correctness baseline;
  * two scale paths: random-hyperplane LSH bucketing (candidate set shrinks
  * by ~2^planes; recall traded via multi-probe of neighboring buckets) and
  * an IVF coarse quantizer (k-means lists trained on a deterministic
  * sample; queries probe the `nprobe` nearest lists).
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

  /** Guard for the LSH entry points: the bucket expression's contract
    * buckets any vector whose length != `dim` as 0L, so a corpus whose
    * real dimension differs from the parameter (e.g. 128-dim embeddings
    * against the default 64) would SILENTLY collapse to a single bucket —
    * results stay correct but the pruning the operator exists for
    * disappears. One tiny sample job per operator call catches it loudly.
    */
  private[operators] def requireDim(vecs: DataFrame, vecCol: String, dim: Int): Unit = {
    val sample = vecs.filter(col(vecCol).isNotNull)
      .select(size(col(vecCol))).limit(1).collect()
    sample.headOption.foreach { r =>
      require(r.getInt(0) == dim,
        s"embedding dimension mismatch: column '$vecCol' has ${r.getInt(0)} " +
          s"components but the LSH operator was configured with dim=$dim — " +
          "every vector would silently bucket to 0 (no pruning); pass the " +
          "corpus's real dimension")
    }
  }

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
    // norms hoisted out of the O(|q|·n) pair loop — bit-identical to the
    // fused cosine (Fns.cosineWithNorms)
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cv"))
      .withColumn("cn", Fns.vecNorm(col("cv")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", Fns.vecNorm(col("qv")))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        Fns.cosineWithNorms(Fns.vecDot(col("qv"), col("cv")),
          col("qn"), col("cn")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("sim", round(col("sim"), 4))
  }

  /** LSH-bucketed ANN: corpus and queries hashed to hyperplane buckets;
    * candidates = corpus rows in any probed bucket — the query's own
    * bucket plus the first `probes - 1` single-bit flips (capped at
    * `planes`, so `probes >= planes + 1` probes every neighbor) — exact
    * cosine re-rank inside. `probes` is a genuine recall/cost knob:
    * candidate volume scales with the probed-bucket count. (It was
    * previously a boolean in disguise — any value >= 2 flipped ALL bits.)
    * Recall < 1 by construction; verified against brute force in tests.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      planes: Int = 8, probes: Int = 2, seed: Long = 42L, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    requireDim(corpus, vecCol, dim)
    requireDim(queries, vecCol, dim)
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cv"))
      .withColumn("cn", Fns.vecNorm(col("cv")))
      .withColumn("bucket", hyperplaneBucket(col("cv"), planes, seed, dim))
    // multi-probe: original bucket + the first (probes-1) single-bit
    // flips, as an exploded probe list -> the join stays a hash join on
    // bucket. Flip order is fixed (bit 0 upward): deterministic, and each
    // flip adds one adjacent Hamming-1 bucket.
    val nFlips = (probes - 1).max(0).min(planes)
    val probeBuckets: Column => Column = b =>
      array(b +: (0 until nFlips).map(p => b.bitwiseXOR(lit(1L << p))): _*)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", Fns.vecNorm(col("qv")))
      .withColumn("qbucket", hyperplaneBucket(col("qv"), planes, seed, dim))
      .select(col("query_id"), col("qv"), col("qn"),
        explode(probeBuckets(col("qbucket"))).as("bucket"))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        Fns.cosineWithNorms(Fns.vecDot(col("qv"), col("cv")),
          col("qn"), col("cn")).as("sim"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("sim", round(col("sim"), 4))
  }

  // ---- IVF (inverted-file) coarse quantizer ----------------------------

  /** Exact cosine between same-length vectors. Mismatched lengths RAISE
    * (the HyperplaneBucket contract): silently truncating to the shorter
    * prefix would train centroids / rank candidates on partial vectors
    * without a whisper on a ragged corpus.
    */
  private def cosLocal(a: Array[Double], b: Array[Double]): Double = {
    require(a.length == b.length,
      s"ragged vectors in IVF path: ${a.length} vs ${b.length} components")
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = a.length
    while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0.0 || nb == 0.0) -2.0 else dot / math.sqrt(na * nb)
  }

  private def nearestList(cents: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0; var bestSim = -3.0; var c = 0
    while (c < cents.length) {
      val s = cosLocal(cents(c), v)
      if (s > bestSim) { bestSim = s; best = c }
      c += 1
    }
    best
  }

  /** Train `nlist` coarse centroids with Lloyd's algorithm on a
    * DETERMINISTIC hash-ordered sample collected to the driver — the
    * FAISS-style IVF recipe: the quantizer trains on a bounded sample
    * (identical results on every run and at any corpus scale), only the
    * ASSIGNMENT pass runs distributed. Empty clusters keep their previous
    * centroid. Returns `min(nlist, sampleRows)` centroids.
    */
  def trainCentroids(corpus: DataFrame, nlist: Int, iters: Int = 5,
      sampleSize: Int = 4096, idCol: String = "vec_id",
      vecCol: String = "embedding"): Array[Array[Double]] = {
    val rows = corpus
      .filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(sampleSize)
      .collect()
      .flatMap(r => Option(r.getSeq[Float](1)).map(_.map(_.toDouble).toArray))
      .filter(_.nonEmpty)
    require(rows.nonEmpty, "cannot train IVF centroids on an empty corpus")
    val k = math.min(nlist, rows.length)
    var cents = rows.take(k).map(_.clone)
    val dim = rows.head.length
    // ragged sample = contract violation (mirrors cosLocal): raise here,
    // at training time, not deep inside an executor UDF
    require(rows.forall(_.length == dim),
      s"ragged embedding column '$vecCol': sample has lengths " +
        rows.map(_.length).distinct.sorted.mkString("{", ",", "}"))
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      rows.foreach { v =>
        val c = nearestList(cents, v)
        var i = 0
        while (i < v.length) { sums(c)(i) += v(i); i += 1 }
        counts(c) += 1
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c)
        else sums(c).map(_ / counts(c))
      }
    }
    cents
  }

  /** IVF ANN: corpus vectors assigned to their nearest coarse centroid's
    * inverted list (one distributed pass, tight-loop UDF over the
    * broadcast centroids); each query probes its `nprobe` nearest lists
    * and re-ranks candidates by exact cosine. Candidates shrink by
    * ~nprobe/nlist; `nprobe = nlist` degenerates to exhaustive search and
    * must equal brute force exactly (the IvfSpec identity gate).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4, iters: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(nprobe >= 1 && nprobe <= nlist, "need 1 <= nprobe <= nlist")
    val cents = trainCentroids(corpus, nlist, iters, idCol = idCol, vecCol = vecCol)
    val assignU = udf { (v: Seq[Float]) =>
      if (v == null || v.isEmpty) -1
      else nearestList(cents, v.map(_.toDouble).toArray)
    }
    val probeU = udf { (v: Seq[Float]) =>
      if (v == null || v.isEmpty) Array.empty[Int]
      else {
        val vd = v.map(_.toDouble).toArray
        cents.indices
          .map(c => (cosLocal(cents(c), vd), c))
          .sortBy { case (s, c) => (-s, c) }
          .take(nprobe).map(_._2).toArray
      }
    }
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cv"))
      .withColumn("cn", Fns.vecNorm(col("cv")))
      .withColumn("list_id", assignU(col("cv")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", Fns.vecNorm(col("qv")))
      .select(col("query_id"), col("qv"), col("qn"),
        explode(probeU(col("qv"))).as("list_id"))
    val scored = q.join(c, Seq("list_id"))
      .filter(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        Fns.cosineWithNorms(Fns.vecDot(col("qv"), col("cv")),
          col("qn"), col("cn")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("sim", round(col("sim"), 4))
  }
}
