package graft

import graft.functions.Fns
import graft.operators.{Ann, Dedup, Multimodal, Route}
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("templateExpand: reference token syntax ~~{name}~~") {
    val df = Seq(("alice", "login")).toDF("user", "event")
    val out = df.select(Fns.templateExpand("user ~~{user}~~ did ~~{event}~~!",
      Map("user" -> col("user"), "event" -> col("event"))).as("s"))
    assert(out.head().getString(0) === "user alice did login!")
    // template starting and ending with tokens
    val out2 = df.select(Fns.templateExpand("~~{user}~~/~~{event}~~",
      Map("user" -> col("user"), "event" -> col("event"))).as("s"))
    assert(out2.head().getString(0) === "alice/login")
    // unknown token is left verbatim (reference leaves unresolved tokens)
    val out3 = df.select(Fns.templateExpand("x ~~{nope}~~", Map.empty).as("s"))
    assert(out3.head().getString(0) === "x ~~{nope}~~")
  }

  test("recordToJson matches reference CSV->JSON golden shape") {
    // golden from reference JsonProcessorTest.java:67 (keys/values, JSON form)
    val df = Seq(("val1", "val2")).toDF("header1", "header2")
    val s = df.select(Fns.recordToJson(df).as("j")).head().getString(0)
    assert(s === """{"header1":"val1","header2":"val2"}""")
  }

  test("cleanHeaders renames like reference CleanCSVHeader") {
    val df = Seq((1, 2)).toDF("col one", "col two")
    assert(Fns.cleanHeaders(df, " ", "_").columns.toSeq === Seq("col_one", "col_two"))
  }

  test("hmacSha256 is deterministic and key-sensitive") {
    val df = Seq("payload").toDF("s")
    val a = df.select(Fns.hmacSha256("k1")(col("s"))).head().getString(0)
    val b = df.select(Fns.hmacSha256("k1")(col("s"))).head().getString(0)
    val c = df.select(Fns.hmacSha256("k2")(col("s"))).head().getString(0)
    assert(a === b)
    assert(a != c && a.nonEmpty)
  }

  test("shingles / minhash / simhash behave on short and empty text") {
    val df = Seq("one two three four", "one two", "").toDF("t")
    val sh = df.select(Fns.shingles(col("t"), 3).as("s")).collect().map(_.getSeq[String](0))
    assert(sh(0) === Seq("one two three", "two three four"))
    assert(sh(1) === Seq.empty)
    val mh = df.select(Fns.minhashSignature(col("t"), 3, 8).as("m"))
      .collect().map(_.getSeq[Long](0))
    assert(mh(0).length === 8 && mh(1).forall(_ === Long.MaxValue))
    val sim = df.select(Fns.simhash64(col("t")).as("h")).collect().map(_.getLong(0))
    assert(sim(0) != 0L)
    assert(sim(2) === 0L)
  }

  test("langId picks the stopword-dominant language deterministically") {
    val df = Seq(
      "the cat and the dog of a house",
      "der hund und die katze ist nicht da",
      "el perro y la casa de que es",
      "zzz qqq www").toDF("t")
    val got = df.select(Fns.langId(col("t"))).collect().map(_.getString(0)).toSeq
    assert(got === Seq("en", "de", "es", "unknown"))
  }

  test("cosine dot product matches manual computation") {
    val df = Seq((Array(1.0f, 0.0f, 1.0f), Array(1.0f, 1.0f, 0.0f))).toDF("a", "b")
    val sim = df.select(Fns.cosine(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(sim - 0.5) < 1e-9)
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over a lazy dog"), // near dup of 1
    (4L, "completely different content about spark engines"),
    (5L, "Completely  different content about spark engines"), // normalized dup of 4
    (6L, "unrelated text with no overlap whatsoever here")
  ).toDF("doc_id", "text")

  test("exact dedup groups byte-identical (normalized) docs") {
    val groups = Dedup.exact(docs).collect()
    val dupGroups = groups.filter(_.getAs[Long]("n_dups") > 0)
    assert(dupGroups.map(_.getAs[Long]("keep_id")).toSet === Set(1L, 4L))
    assert(groups.map(_.getAs[Long]("n_members")).sum === 6L)
  }

  test("ngram jaccard finds near-dups with exact similarity") {
    val pairs = Dedup.ngramJaccard(docs, threshold = 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(p => (p._1, p._2))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((1L, 2L)) && keys.contains((1L, 3L)) && keys.contains((4L, 5L)))
    assert(pairs.collect { case (1L, 2L, j) => j }.head === 1.0)
    assert(!keys.exists { case (a, b) => a == 6L || b == 6L })
  }

  test("minhash LSH candidates cover all high-jaccard pairs (no false negatives at tau)") {
    val exact = Dedup.ngramJaccard(docs, threshold = 0.7).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(docs, k = 16, bands = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(lsh),
      s"LSH candidates $lsh must cover exact pairs $exact")
  }

  test("simhash pairs: identical docs at hamming 0, near dups close") {
    val pairs = Dedup.simhashPairs(docs, maxHamming = 16).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Number](2).longValue)).toMap
    assert(pairs(1L -> 2L) === 0L)
    assert(pairs(4L -> 5L) === 0L) // normalization folds case/whitespace
    assert(pairs.get(1L -> 3L).forall(_ <= 16L))
  }

  test("pair clustering resolves transitive near-dup groups") {
    // chain 1-2-3 plus isolated pair (7,9): clusters {1,2,3} and {7,9}
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val cl = Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
    val survivors = Dedup.dropNearDuplicates(docs, Seq((1L, 2L), (4L, 5L)).toDF("id_a", "id_b"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors === Set(1L, 3L, 4L, 6L))
  }

  test("embedding cosine dedup finds the planted near-duplicate") {
    val base = Array.tabulate(8)(i => math.sin(i + 1).toFloat)
    val near = base.clone(); near(0) = near(0) + 0.01f
    val far = Array.tabulate(8)(i => math.cos(3 * i + 2).toFloat)
    val vecs = Seq((1L, base), (2L, near), (3L, far)).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingCosine(vecs, threshold = 0.99, dim = 8).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
  }
}

class AnnSpec extends SparkSpec {
  import spark.implicits._

  private def randVec(seed: Int, dim: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(dim)((r.nextDouble() - 0.5).toFloat)
  }

  private val dim = 16
  private val corpus = (0 until 200).map(i => (i.toLong, randVec(i, dim)))
    .toDF("vec_id", "embedding")

  test("brute force top-k returns exactly k ranked neighbors per query") {
    val queries = corpus.filter(col("vec_id") < 3)
    val got = Ann.bruteForceTopK(corpus, queries, k = 5)
    val byQ = got.collect().groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet === Set(0L, 1L, 2L))
    byQ.values.foreach { rows =>
      assert(rows.length === 5)
      assert(rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("sim")).toSeq
        === rows.map(_.getAs[Double]("sim")).toSeq.sorted.reverse)
    }
  }

  test("LSH ANN achieves reasonable recall@10 vs brute force") {
    val queries = corpus.filter(col("vec_id") < 20)
    val exact = Ann.bruteForceTopK(corpus, queries, k = 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nbr_id"))).toSet
    val approx = Ann.lshTopK(corpus, queries, k = 10,
      planes = 4, probes = 5, dim = dim).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nbr_id"))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // random 16-dim vectors have weak LSH signal; the point is the
    // bucketed candidate set beats its share of the corpus
    assert(recall >= 0.4, f"recall@10 = $recall%.2f too low")
  }
}

class RouteMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("predicate routing partitions a batch like QueryRecord") {
    val df = Seq(("m", 1), ("f", 2), ("m", 3), ("x", 4)).toDF("gender", "v")
    val routes = Route.byPredicates(df, Map(
      "male" -> (col("gender") === "m"), "female" -> (col("gender") === "f")))
    assert(routes("male").count() === 2 && routes("female").count() === 1)
    assert(Route.unmatched(df, Map(
      "male" -> (col("gender") === "m"),
      "female" -> (col("gender") === "f"))).count() === 1)
    val tags = Route.tagged(df, Seq(
      "male" -> (col("gender") === "m"), "any" -> lit(true)))
      .select("route").collect().map(_.getString(0)).toSeq
    assert(tags === Seq("male", "any", "male", "any"))
  }

  test("matchStatus reproduces the match-or-create decision table") {
    val target = Seq(("k1", 1), ("k2", 2), ("k2", 3)).toDF("key", "x")
    val incoming = Seq("k1", "k2", "k3").toDF("key")
    val got = Route.matchStatus(incoming, target, "key").collect()
      .map(r => r.getAs[String]("key") -> r.getAs[String]("match_status")).toMap
    assert(got === Map("k1" -> "MATCH", "k2" -> "MULTIPLE", "k3" -> "NO_MATCH"))
  }

  test("multimodal feature extraction is deterministic over binary payloads") {
    val payloads = Seq(
      (1L, "fake image bytes".getBytes("UTF-8")),
      (2L, Array.emptyByteArray),
      (3L, "other payload".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val f1 = Multimodal.extractFeatures(payloads).collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(payloads).collect().sortBy(_.doc_id)
    assert(f1.toSeq === f2.toSeq)
    assert(f1(0).n_bytes === 16 && f1(1).n_bytes === 0)
    assert(f1.forall(f => f.width >= 64 && f.height >= 64))
  }

  test("byte-window sampling explodes payloads into fixed windows") {
    val payloads = Seq((1L, Array.range(0, 10).map(_.toByte))).toDF("doc_id", "payload")
    val w = Multimodal.sampleWindows(payloads, windowBytes = 4, stride = 4).collect()
    assert(w.length === 3)
    assert(w.map(_.getAs[Array[Byte]]("window").length).toSeq === Seq(4, 4, 2))
  }
}
