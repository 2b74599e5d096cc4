package graft

import graft.changegen.{ChangeGen, Phase, RawEvent}
import graft.functions.Fns
import graft.merge.{ColumnPolicy, MergeConfig, MergeInto}
import graft.model.Ops
import graft.operators.{Dedup, Edges, Route}
import graft.sources.CsvSource
import graft.table.{LakeTable, Maintenance}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity extraction + JSONPath template tokens (reference
  * PontusNLPProcessor regex set, StringReplacer.replaceTokens).
  */
class EntityTemplateSpec extends SparkSpec {
  import spark.implicits._

  test("entity regexes extract email/url/phone/postcode") {
    val df = Seq(
      "mail bob.smith+x@ex-ample.org see https://a.b/c_d call +44 7123 456789 at SW1A 1AA",
      "no entities in this line at all").toDF("t")
    val out = df.select(Fns.extractEntities(col("t")).map {
      case (n, c) => c.as(n)
    }: _*).collect()
    assert(out(0).getSeq[String](0) === Seq("bob.smith+x@ex-ample.org"))
    assert(out(0).getSeq[String](1) === Seq("https://a.b/c_d"))
    assert(out(0).getSeq[String](2) === Seq("+44 7123 456789"))
    assert(out(0).getSeq[String](3) === Seq("SW1A 1AA"))
    assert((0 until 4).forall(i => out(1).getSeq[String](i).isEmpty))
  }

  test("templateExpandJsonPaths resolves JSONPath and attribute tokens") {
    val df = Seq((("""{"a":{"b":7},"k":5}"""), "login")).toDF("j", "e")
    val out = df.select(Fns.templateExpandJsonPaths(
      "k=~~{$.k}~~ ab=~~{$.a.b}~~ miss=~~{$.nope}~~ e=~~{e}~~",
      col("j"), Map("e" -> col("e"))).as("s")).head().getString(0)
    // missing path renders empty (reference Path Not Found = ignore)
    assert(out === "k=5 ab=7 miss= e=login")
  }
}

/** Fuzzy match-or-create + three-valued-logic routing fixes. */
class FuzzyRouteSpec extends SparkSpec {
  import spark.implicits._

  test("matchStatusFuzzy: blocked levenshtein decision table") {
    val target = Seq(("abc", "b1"), ("abd", "b1"), ("xyz", "b2"))
      .toDF("key", "block")
    val incoming = Seq(
      ("abx", "b1"), // dist 1 to abc AND abd -> MULTIPLE
      ("xyzz", "b2"), // dist 1 to xyz -> MATCH
      ("abc", "b2"), // right key, wrong block -> NO_MATCH (blocking is exact)
      ("qqqq", "b1") // nothing close -> NO_MATCH
    ).toDF("probe", "block")
    val got = Route.matchStatusFuzzy(incoming, target, "block", "probe", "key", 1)
      .collect().map(r => r.getAs[String]("probe") -> r.getAs[String]("match_status"))
      .toMap
    assert(got === Map("abx" -> "MULTIPLE", "xyzz" -> "MATCH",
      "abc" -> "NO_MATCH", "qqqq" -> "NO_MATCH"))
  }

  test("null predicate values route to unmatched, not dropped") {
    val df = Seq(("m", Some(1)), ("f", None), ("x", Some(3)))
      .toDF("gender", "v")
    // v > 0 is NULL for the None row: it must still land somewhere
    val routes = Map("pos" -> (col("v") > 0))
    val total = Route.byPredicates(df, routes).values.map(_.count()).sum +
      Route.unmatched(df, routes).count()
    assert(total === 3)
    val tags = Route.tagged(df, Seq("pos" -> (col("v") > 0)))
      .select("route").collect().map(_.getString(0)).toSeq
    assert(tags === Seq("pos", "unmatched", "pos"))
  }
}

/** CSV front door: quote-aware parse, corrupt-record dead-letter routing,
  * header normalization (reference CSVToJSONProcessor + CleanCSVHeader).
  */
class CsvSourceSpec extends SparkSpec {

  test("routed CSV read: good rows parsed, mismatches quarantined") {
    val dir = tmpDir("csv-route")
    val lines = Seq(
      "id,name x,payload", // header ('name x' gets normalized)
      """1,alice,"a,b""c"""", // quoted separator + RFC doubled quote
      "2,bob,plain",
      "3,eve", // column-count mismatch -> corrupt
      "4,mallory,ok,extra" // too many columns -> corrupt
    )
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "in.csv"),
      lines.mkString("\n").getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id INT, `name x` STRING, payload STRING")
    val routed = CsvSource.readRouted(spark, s"$dir/in.csv", schema,
      header = true, headerFind = " ", headerReplace = "_")
    assert(routed.good.columns.toSeq === Seq("id", "name_x", "payload"))
    val good = routed.good.orderBy("id").collect()
    assert(good.map(_.getInt(0)).toSeq === Seq(1, 2))
    assert(good(0).getString(2) === """a,b"c""")
    val corrupt = routed.corrupt.collect().map(_.getString(0)).toSet
    assert(corrupt === Set("3,eve", "4,mallory,ok,extra"))
  }
}

/** Per-column update policies + dead-letter null-op + edges emission. */
class MergePolicySpec extends SparkSpec {
  import spark.implicits._

  private def batchDf(events: Seq[RawEvent]): DataFrame =
    ChangeGen.projectPhase(events.toDF(), Phase(0, Long.MaxValue)).drop("seg")

  private def ev(lsn: Long, key: String, op: String, tok: Array[Int],
      source: String = "s") =
    RawEvent(lsn, key, op, tok, if (tok == null) -1 else tok.length, source, null, 0)

  test("ExcludeFromUpdate keeps insert-time value; delete+reinsert resets it") {
    val work = tmpDir("lake-policy")
    val table = LakeTable(s"$work/t")
    val cfg = MergeConfig(numBuckets = 4,
      columnPolicy = Map("source" -> ColumnPolicy.ExcludeFromUpdate))
    MergeInto.apply(spark, table,
      batchDf(Seq(ev(1, "a", Ops.Insert, Array(1), "first"))), "cp", 0, cfg)
    MergeInto.apply(spark, table,
      batchDf(Seq(ev(2, "a", Ops.Update, Array(2), "second"))), "cp", 1, cfg)
    val r1 = table.read(spark).select("doc_id", "source", "lsn").head()
    // data columns follow the winner, source stays from insert time
    assert(r1.getString(1) === "first" && r1.getLong(2) === 2L)
    // delete then re-insert: the re-insert sets the excluded column anew
    MergeInto.apply(spark, table,
      batchDf(Seq(ev(3, "a", Ops.Delete, null))), "cp", 2, cfg)
    MergeInto.apply(spark, table,
      batchDf(Seq(ev(4, "a", Ops.Upsert, Array(4), "third"))), "cp", 3, cfg)
    assert(table.read(spark).select("source").head().getString(0) === "third")
  }

  test("CoalesceExisting: null incoming value keeps the stored one") {
    val work = tmpDir("lake-coal")
    val table = LakeTable(s"$work/t")
    val cfg = MergeConfig(numBuckets = 4,
      columnPolicy = Map("source" -> ColumnPolicy.CoalesceExisting))
    MergeInto.apply(spark, table,
      batchDf(Seq(ev(1, "a", Ops.Insert, Array(1), "kept"))), "cp", 0, cfg)
    MergeInto.apply(spark, table,
      batchDf(Seq(ev(2, "a", Ops.Update, Array(2), null))), "cp", 1, cfg)
    val r = table.read(spark).select("source", "lsn").head()
    assert(r.getString(0) === "kept" && r.getLong(1) === 2L)
  }

  test("dead-letter: null op is quarantined, not vanished") {
    val work = tmpDir("lake-dlq-nullop")
    val table = LakeTable(s"$work/t")
    val cfg = MergeConfig(numBuckets = 4, deadLetterDir = Some(s"$work/dlq"))
    val nullOp = Seq((5L, "n", null.asInstanceOf[String], Seq(5), 1, "s"))
      .toDF("lsn", "doc_id", "op", "tokens", "n_tok", "source")
    val batch = batchDf(Seq(ev(1, "a", Ops.Insert, Array(1)))).unionByName(nullOp)
    MergeInto.apply(spark, table, batch, "cp", 0, cfg)
    assert(table.read(spark).count() === 1)
    val dlq = spark.read.parquet(s"$work/dlq/cp=cp/batch=0")
    assert(dlq.count() === 1 && dlq.head().isNullAt(dlq.columns.indexOf("op")))
  }

  test("edges: repeat observations aggregate with LSN range") {
    val df = Seq((1L, "u1", "e1"), (2L, "u1", "e1"), (3L, "u2", "e1"))
      .toDF("lsn", "u", "e")
    val got = Edges.emit(df, "acted", col("u"), col("e"), Some(col("lsn")))
      .orderBy("from_id").collect()
    assert(got.length === 2)
    val u1 = got(0)
    assert(u1.getAs[String]("edge_label") === "acted" &&
      u1.getAs[Long]("n_obs") === 2L &&
      u1.getAs[Long]("min_lsn") === 1L && u1.getAs[Long]("max_lsn") === 2L)
  }

  test("vacuum spares in-flight staging dirs above the current version") {
    val work = tmpDir("lake-vac")
    val table = LakeTable(s"$work/t")
    MergeInto.apply(spark, table,
      batchDf(Seq(ev(1, "a", Ops.Insert, Array(1)))), "cp", 0,
      MergeConfig(numBuckets = 2))
    // an in-flight writer has staged files for the NEXT version
    val inflight = new java.io.File(table.stagingDir(table.currentVersion() + 1))
    inflight.mkdirs()
    val staged = new java.io.File(inflight, "part-inflight.parquet")
    java.nio.file.Files.write(staged.toPath, Array[Byte](1, 2, 3))
    val deleted = Maintenance.vacuum(table, retainFromVersion = 0)
    assert(deleted.isEmpty)
    assert(staged.exists(), "vacuum must not delete in-flight staging files")
  }
}

/** Embedding near-dup: exact vs bucketed multi-probe recall. */
class EmbeddingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("multi-probe LSH recovers most exact pairs (recall gate)") {
    val dim = 16
    val rnd = new scala.util.Random(7)
    // 5 cluster centers, 20 members each with small noise
    val centers = Array.fill(5)(Array.fill(dim)((rnd.nextDouble() - 0.5).toFloat))
    val vecs = (0 until 100).map { i =>
      val c = centers(i % 5)
      (i.toLong, c.map(x => x + (rnd.nextDouble() * 0.1 - 0.05).toFloat))
    }.toDF("vec_id", "embedding")
    val exact = Dedup.embeddingCosine(vecs, threshold = 0.9, planes = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val single = Dedup.embeddingCosine(vecs, threshold = 0.9, planes = 6,
      dim = dim, multiProbe = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val probed = Dedup.embeddingCosine(vecs, threshold = 0.9, planes = 6,
      dim = dim, multiProbe = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // multi-probe strictly extends the single-bucket candidate set
    assert(single.subsetOf(probed))
    assert(probed.subsetOf(exact)) // never a false positive (exact re-rank)
    val recall = (exact & probed).size.toDouble / exact.size
    assert(recall >= 0.6, f"multi-probe recall $recall%.2f too low")
    val recallSingle = (exact & single).size.toDouble / exact.size
    assert(recall >= recallSingle)
  }
}

/** Native hyperplane-bucket expression: parity with the interpreted
  * Column formulation, codegen (no UDF / no higher-order interpreter),
  * and ledger retention compaction.
  */
class HyperplaneLedgerSpec extends SparkSpec {
  import spark.implicits._

  test("native hyperplane_bucket matches the interpreted formulation") {
    val dim = 16
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 50).map(i =>
      (i.toLong, Array.fill(dim)((rnd.nextDouble() - 0.5).toFloat)))
      .toDF("id", "v")
    val native = vecs.select(col("id"),
      graft.operators.Ann.hyperplaneBucket(col("v"), 8, 42L, dim).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val interpreted = vecs.select(col("id"),
      graft.operators.Ann.hyperplaneBucketColumns(col("v"), 8, 42L, dim).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native === interpreted)
    assert(native.values.toSet.size > 1, "buckets must actually split")
    val plan = vecs.select(
      graft.operators.Ann.hyperplaneBucket(col("v"), 8, 42L, dim))
      .queryExecution.executedPlan.toString
    assert(plan.contains("hyperplane_bucket") && !plan.contains("ScalaUDF"))
  }

  test("ledger compaction keeps idempotence exact at bounded size") {
    import graft.changegen.{ChangeGen, Phase, RawEvent}
    import graft.merge.{MergeConfig, MergeInto}
    import graft.model.Ops
    import graft.table.LakeTable
    val work = tmpDir("lake-ledger")
    val table = LakeTable(s"$work/t")
    val cfg = MergeConfig(numBuckets = 2, ledgerRetention = 2)
    def batch(lsn: Long) = ChangeGen.projectPhase(
      Seq(RawEvent(lsn, s"k$lsn", Ops.Insert, Array(lsn.toInt), 1, "s", null, 0))
        .toDF(), Phase(0, Long.MaxValue)).drop("seg")
    (0L until 6L).foreach(b => MergeInto.apply(spark, table, batch(b), "cp", b, cfg))
    val m = table.currentManifest()
    assert(m.ledger.size === 2, s"ledger should be capped, got ${m.ledger.keySet}")
    assert(m.floorBatch === Map("cp" -> 3L))
    // replaying a compacted-away batch is still a no-op
    val r = MergeInto.apply(spark, table, batch(1L), "cp", 1L, cfg)
    assert(r.skipped)
    assert(table.read(spark).count() === 6)
    // a genuinely new batch still applies
    val r2 = MergeInto.apply(spark, table, batch(7L), "cp", 7L, cfg)
    assert(!r2.skipped && table.read(spark).count() === 7)
  }
}

/** SimHash chunk blocking must be lossless at the requested radius. */
class SimhashBlockingSpec extends SparkSpec {
  import spark.implicits._

  test("chunked blocking finds ALL pairs within maxHamming (pigeonhole)") {
    // perturbed variants of two base texts: near pairs at hamming up to
    // ~10, cross pairs far apart
    val base1 = "the quick brown fox jumps over the lazy dog again and again"
    val base2 = "completely different content about spark engines at scale now"
    val docs = (0 until 8).map { i =>
      val b = if (i % 2 == 0) base1 else base2
      (i.toLong, if (i < 4) b else b + s" tail$i word")
    }.toDF("doc_id", "text")
    for (maxH <- Seq(3, 8, 12)) {
      val sk = docs.select(col("doc_id").as("id"),
        graft.functions.Fns.simhash64(col("text")).as("sk"))
      val exact = sk.as("a").join(sk.as("b"), col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id"),
          graft.functions.Fns.hamming64(col("a.sk"), col("b.sk")).as("h"))
        .filter(col("h") <= maxH)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val blocked = Dedup.simhashPairs(docs, maxHamming = maxH)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(blocked === exact, s"maxHamming=$maxH")
    }
  }
}

/** Zero-norm / length-mismatch cosine edge cases (null, never NaN). */
class CosineEdgeSpec extends SparkSpec {
  import spark.implicits._

  test("zero vector and length mismatch yield null, not NaN") {
    val df = Seq(
      (1L, Array(0.0f, 0.0f), Array(1.0f, 2.0f)), // zero left norm
      (2L, Array(1.0f, 2.0f), Array(0.0f, 0.0f)), // zero right norm
      (3L, Array(1.0f, 2.0f), Array(1.0f, 2.0f))).toDF("id", "a", "b")
    val rows = df.select(col("id"), Fns.cosine(col("a"), col("b")).as("c"))
      .orderBy("id").collect()
    assert(rows(0).isNullAt(1) && rows(1).isNullAt(1))
    assert(math.abs(rows(2).getDouble(1) - 1.0) < 1e-12)
    val mism = Seq((1L, Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f)))
      .toDF("id", "a", "b")
      .select(Fns.cosine(col("a"), col("b"))).head()
    assert(mism.isNullAt(0))
  }
}
