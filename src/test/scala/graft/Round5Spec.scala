package graft

import graft.changegen.{ChangeGen, FeedConfig, Phase, RawEvent}
import graft.merge.{MergeConfig, MergeInto}
import graft.model.Ops
import graft.stream.{CdcStream, StreamConfig}
import graft.table.{FileEntry, LakeTable, Maintenance, Manifest}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round 5: automatic maintenance wired into the streaming driver — the
  * 100-TB operating mode (delta append + periodic fold + metadata expiry)
  * must run itself, keeping file and snapshot-head counts BOUNDED over a
  * long trickle replay while the final state still matches the oracle.
  */
class InlineMaintenanceSpec extends SparkSpec {

  test("maintained trickle replay: bounded files + heads, oracle-equal state") {
    val work = tmpDir("inline-maint")
    val feed = FeedConfig(numEvents = 12000, numKeys = 250, seed = 53,
      deleteFraction = 0.1, dupFraction = 0.02, outOfOrderWindow = 200,
      eventsPerSegment = 500, filesPerSegment = 1) // 24 trickle micro-batches
    val Seq(phaseDir) = ChangeGen.writeFeed(spark, s"$work/feed", feed)
    def cfgFor(table: String, cp: String, every: Int) = StreamConfig(
      feedDir = phaseDir, tableDir = s"$work/$table",
      checkpointDir = s"$work/$cp", checkpointId = cp,
      maxFilesPerTrigger = 1,
      merge = MergeConfig(numBuckets = 8, deltaAppendThreshold = 1000000L),
      maintenanceEvery = every, maintenanceBuckets = 8,
      retainSnapshots = 3,
      // the feed's TOTAL disorder bound: jitter window PLUS the duplicate
      // redelivery shift (dups re-emit one whole segment late with their
      // original LSN) — promising only the jitter window is exactly the
      // unsafe-slack mistake the config doc warns about, and this test
      // demonstrated it: a GC'd tombstone let a late duplicate resurrect
      // its key
      tombstoneSlackLsn = feed.outOfOrderWindow.toLong + feed.eventsPerSegment + 1)

    // unmaintained control: delta files accumulate one per touched bucket
    // per batch
    CdcStream.runToCompletion(spark, cfgFor("t0", "c0", every = 0))
    val unmaintained = LakeTable(s"$work/t0")
    val filesUnmaintained = unmaintained.filesOf(unmaintained.currentManifest()).size

    val got = CdcStream.runToCompletion(spark, cfgFor("t1", "c1", every = 4))
      .select("doc_id", "tokens", "lsn").collect()
      .map(r => r.getString(0) -> ((r.getSeq[Int](1), r.getLong(2)))).toMap
    val oracle = ChangeGen.oracleFinalState(ChangeGen.generateLocal(feed))
      .map { case (k, e) => k -> ((e.tokens.toSeq, e.lsn)) }
    assert(got === oracle)

    val t = LakeTable(s"$work/t1")
    val m = t.currentManifest()
    val files = t.filesOf(m).size
    // bounded: at most one base file per bucket plus the deltas of the
    // batches since the last maintenance cycle (maintenanceEvery batches x
    // <= numBuckets touched each)
    assert(files < filesUnmaintained,
      s"maintenance must shrink the file count ($files vs $filesUnmaintained)")
    assert(files <= 8 + 4 * 8, s"file count must stay bounded, got $files")
    // snapshot heads expired down to the retention window
    val fs = new org.apache.hadoop.fs.Path(t.root)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    val heads = fs.listStatus(new org.apache.hadoop.fs.Path(t.root, "meta"))
      .map(_.getPath.getName).count(n => n.startsWith("v") && n.endsWith(".json"))
    assert(heads <= 3 + 4 + 1,
      s"snapshot heads must stay bounded by retention + cycle length, got $heads")
    // tombstone GC: deletes older than (max applied LSN - slack) are gone;
    // only recent ones may remain
    val slackFloor = 12000L - (feed.outOfOrderWindow + 1)
    val staleTombs = t.readStored(spark)
      .filter(col(LakeTable.TOMBSTONE) && col("lsn") <= slackFloor - 1).count()
    // compaction after the LAST maintenance cycle may leave a tail of
    // un-GC'd tombstones from the final batches; stale ones below the
    // last cycle's watermark must be gone from the compacted buckets.
    // The unmaintained control keeps every tombstone, so a strict drop
    // proves GC ran.
    val allTombsControl = unmaintained.readStored(spark)
      .filter(col(LakeTable.TOMBSTONE)).count()
    val allTombs = t.readStored(spark).filter(col(LakeTable.TOMBSTONE)).count()
    assert(allTombs < allTombsControl,
      s"watermarked GC must drop tombstones ($allTombs vs $allTombsControl); stale=$staleTombs")
  }
}

/** Feed-source hygiene: a year-long tail must not accumulate O(history)
  * source listing / seen-files state. cleanSource removes committed
  * segments; maxFileAge forgets segments older than the horizon.
  */
class SourceHygieneSpec extends SparkSpec {

  test("cleanSource=delete removes committed feed segments") {
    val work = tmpDir("clean-src")
    // cleaning runs on the query thread when numThreads=0 (deterministic)
    spark.conf.set("spark.sql.streaming.fileSource.cleaner.numThreads", "0")
    try {
      val feed = FeedConfig(numEvents = 3000, numKeys = 100, seed = 7,
        eventsPerSegment = 500, filesPerSegment = 1)
      val Seq(phaseDir) = ChangeGen.writeFeed(spark, s"$work/feed", feed)
      def listParquet(): Seq[String] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(walk) else Seq(f)
        walk(new java.io.File(phaseDir)).map(_.getName).filter(_.endsWith(".parquet"))
      }
      val before = listParquet().size
      assert(before >= 6)
      val got = CdcStream.runToCompletion(spark, StreamConfig(
        feedDir = phaseDir, tableDir = s"$work/t", checkpointDir = s"$work/cp",
        checkpointId = "h", maxFilesPerTrigger = 2,
        merge = MergeConfig(numBuckets = 4),
        cleanSource = Some("delete")))
      // correctness unaffected
      val oracle = ChangeGen.oracleFinalState(ChangeGen.generateLocal(feed))
      assert(got.count() === oracle.size)
      // committed segments deleted -> the listing the source re-scans every
      // trigger stays bounded
      val after = listParquet().size
      assert(after < before, s"cleanSource must shrink the feed dir ($after vs $before)")
    } finally spark.conf.unset("spark.sql.streaming.fileSource.cleaner.numThreads")
  }

  test("maxFileAge bounds the seen-files horizon (stale stragglers ignored)") {
    // maxFileAge purges relative to the NEWEST timestamp the source has
    // seen — on a fresh start everything is admitted (correct for
    // backfill), so the bound matters for files appearing BEHIND the
    // horizon of an already-running tail: a restored-from-backup straggler
    // must not reopen the unbounded seen-files window.
    val work = tmpDir("max-age")
    // key space wider than one segment's event count so the straggler
    // carries keys the young segments never touch
    val feed = FeedConfig(numEvents = 2000, numKeys = 2000, seed = 9,
      eventsPerSegment = 500, filesPerSegment = 1)
    val Seq(phaseDir) = ChangeGen.writeFeed(spark, s"$work/feed", feed)
    val segDirs = Option(new java.io.File(phaseDir).listFiles).toSeq.flatten
      .filter(_.getName.startsWith("seg=")).sortBy(_.getName)
    assert(segDirs.size === 4)
    // hold segments 0-1 back; tail only the young half first
    val held = new java.io.File(work, "held"); held.mkdirs()
    segDirs.take(2).foreach { d =>
      assert(d.renameTo(new java.io.File(held, d.getName)))
    }
    def run(tag: String, maxAge: Option[String]): Long =
      CdcStream.runToCompletion(spark, StreamConfig(
        feedDir = phaseDir, tableDir = s"$work/t-$tag", checkpointDir = s"$work/cp-$tag",
        checkpointId = tag, maxFilesPerTrigger = 2,
        merge = MergeConfig(numBuckets = 4), maxFileAge = maxAge)).count()
    val young = run("aged", Some("1h"))
    val youngCtl = run("ctl", None)
    assert(young === youngCtl)
    // the stragglers reappear with mtimes far behind the horizon
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(walk) else Seq(f)
    val old = System.currentTimeMillis() - 48L * 3600 * 1000
    Option(held.listFiles).toSeq.flatten.foreach { d =>
      assert(d.renameTo(new java.io.File(phaseDir, d.getName)))
    }
    walk(new java.io.File(phaseDir)).filter(_.getName.endsWith(".parquet"))
      .filter(_.getPath.matches(".*seg=[01]/.*"))
      .foreach(f => assert(f.setLastModified(old)))
    // bounded horizon: stragglers ignored; unbounded control: processed
    val aged = run("aged", Some("1h"))
    val ctl = run("ctl", None)
    assert(aged === young, s"aged stragglers must stay ignored ($aged vs $young)")
    assert(ctl > youngCtl, s"control must process the stragglers ($ctl vs $youngCtl)")
  }
}

/** Round-5 maintenance fixes from the round-4 verdict/advice. */
class VacuumReportSpec extends SparkSpec {

  private def fakeEntry(b: Int, tag: String): FileEntry =
    FileEntry(s"/nonexistent/$tag-$b.parquet", b, 1L, 0L, 0L)

  test("vacuum reports manifest deletions on a metadata-only table") {
    val root = tmpDir("vac-meta")
    val t = LakeTable(root)
    // two snapshots, both metadata-only (data/ never created): v1 rewrites
    // bucket 0's range, superseding v0's manifest file for that range
    val m0refs = t.composeManifests(None, Set.empty, Seq(fakeEntry(0, "a")), 4)
    t.commit(Manifest(0L, "s0", None, graft.model.Schemas.seqTable.json, 4,
      Nil, Map.empty, Map.empty, m0refs))
    val m1refs = t.composeManifests(Some(t.currentManifest()), Set(0),
      Seq(fakeEntry(0, "b")), 4)
    t.commit(Manifest(1L, "s1", Some("s0"), graft.model.Schemas.seqTable.json, 4,
      Nil, Map.empty, Map.empty, m1refs))
    val removed = Maintenance.vacuum(t, retainFromVersion = 1L)
    // v0's superseded manifest file must appear in the report even though
    // data/ does not exist (round-4 finding: the early return swallowed it)
    assert(removed.nonEmpty && removed.forall(_.contains("/meta/m-")))
    assert(t.filesOf(t.readManifest(1L)).map(_.path) === Seq("/nonexistent/b-0.parquet"))
  }

  test("aged orphan manifests are swept; young and referenced ones are kept") {
    val root = tmpDir("vac-orphan")
    val t = LakeTable(root)
    val refs = t.composeManifests(None, Set.empty, Seq(fakeEntry(1, "a")), 4)
    t.commit(Manifest(0L, "s0", None, graft.model.Schemas.seqTable.json, 4,
      Nil, Map.empty, Map.empty, refs))
    val metaDir = new java.io.File(root, "meta")
    def orphan(name: String, ageMs: Long): java.io.File = {
      val f = new java.io.File(metaDir, name)
      java.nio.file.Files.writeString(f.toPath, """{"files":[]}""")
      assert(f.setLastModified(System.currentTimeMillis() - ageMs))
      f
    }
    val oldOrphan = orphan("m-dead-orphan.json", 10L * 60 * 1000)
    val youngOrphan = orphan("m-young-orphan.json", 0L)
    // default: no age window -> orphans untouched
    assert(Maintenance.vacuum(t, 0L).isEmpty)
    assert(oldOrphan.exists && youngOrphan.exists)
    // with a 1-minute window: only the aged orphan goes
    val removed = Maintenance.vacuum(t, 0L, orphanManifestAgeMs = 60000L)
    assert(removed.exists(_.endsWith("m-dead-orphan.json")))
    assert(!oldOrphan.exists)
    assert(youngOrphan.exists, "young orphans may be in-flight commits")
    assert(refs.forall(r => new java.io.File(metaDir, r.path).exists),
      "referenced manifests must never be swept")
  }
}

/** IVF vector-contract hardening (round-4 advice): nulls are dropped, not
  * NPE'd; ragged corpora raise instead of silently truncating.
  */
class IvfContractSpec extends SparkSpec {
  import spark.implicits._

  private def vec(seed: Int, dim: Int): Seq[Float] =
    (0 until dim).map(i => ((ChangeGen.mix64(seed.toLong * 31 + i) >>> 40).toFloat / (1 << 12)))

  test("null embeddings do not fail training; they are excluded from lists") {
    val rows = (0 until 40).map(i => (i.toLong, vec(i, 8))) :+ (99L, null.asInstanceOf[Seq[Float]])
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 3 && col("embedding").isNotNull)
    val out = graft.operators.Ann.ivfTopK(corpus, queries, k = 3, nlist = 4, nprobe = 4)
    assert(out.count() === 9)
    assert(out.filter(col("nbr_id") === 99L).count() === 0)
  }

  test("a ragged corpus raises at training time (no silent prefix-truncation)") {
    val rows = (0 until 20).map(i => (i.toLong, vec(i, 8))) :+ (50L, vec(50, 5))
    val corpus = rows.toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Ann.trainCentroids(corpus, nlist = 4)
    }
    assert(e.getMessage.contains("ragged"))
  }
}

/** HTTP ingress edge (the reference's HandleHttpRequest/Response shape):
  * events POSTed over HTTP become ordinary feed segments, and the whole
  * downstream CDC path — admission, MERGE, exactly-once — is unchanged.
  */
class HttpFeedSpec extends SparkSpec {
  import java.net.URI
  import java.net.http.{HttpClient, HttpRequest, HttpResponse}

  private val feedSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("lsn", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("op", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("tokens",
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType)),
    org.apache.spark.sql.types.StructField("n_tok", org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType)))

  private def ev(lsn: Long, key: String, op: String, toks: Seq[Int]): String = {
    val t = if (op == Ops.Delete) "null" else toks.mkString("[", ",", "]")
    val n = if (op == Ops.Delete) "null" else toks.length.toString
    s"""{"lsn":$lsn,"doc_id":"$key","op":"$op","tokens":$t,"n_tok":$n,"source":"http"}"""
  }

  test("posted events -> segments -> merged table state (auto- and forced flush)") {
    val work = tmpDir("http-feed")
    val srv = graft.sources.HttpFeedServer.start(
      spark, s"$work/feed", feedSchema, flushEvery = 4)
    try {
      val client = HttpClient.newHttpClient()
      def post(path: String, body: String): HttpResponse[String] =
        client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${srv.port}$path"))
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.ofString())
      assert(client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${srv.port}/health")).GET().build(),
        HttpResponse.BodyHandlers.ofString()).statusCode() === 200)
      // batch 1: 4 events -> auto-flush at flushEvery
      val r1 = post("/events", Seq(
        ev(1, "a", Ops.Insert, Seq(1)), ev(2, "b", Ops.Insert, Seq(2)),
        ev(3, "a", Ops.Update, Seq(3, 3)), ev(4, "c", Ops.Insert, Seq(4))).mkString("\n"))
      assert(r1.statusCode() === 202 && r1.body().contains("\"accepted\":4"))
      // batch 2: delete + late event, forced flush
      post("/events", Seq(ev(6, "b", Ops.Delete, Nil), ev(5, "c", Ops.Upsert, Seq(5))).mkString("\n"))
      val r2 = post("/flush", "")
      assert(r2.statusCode() === 200 && r2.body().contains("\"seg\":1"))
      assert(post("/flush", "").body().contains("\"seg\":-1"))
    } finally srv.stop()
    val got = CdcStream.runToCompletion(spark, StreamConfig(
      feedDir = s"$work/feed", tableDir = s"$work/t", checkpointDir = s"$work/cp",
      checkpointId = "http", maxFilesPerTrigger = 1,
      merge = MergeConfig(numBuckets = 4)))
      .select("doc_id", "tokens", "lsn").collect()
      .map(r => (r.getString(0), r.getSeq[Int](1), r.getLong(2))).toSet
    assert(got === Set(("a", Seq(3, 3), 3L), ("c", Seq(5), 5L)))
    // receiver restart resumes segment numbering after existing segments
    val srv2 = graft.sources.HttpFeedServer.start(spark, s"$work/feed", feedSchema)
    try {
      val client = HttpClient.newHttpClient()
      client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${srv2.port}/events"))
        .POST(HttpRequest.BodyPublishers.ofString(ev(7, "d", Ops.Insert, Seq(7)))).build(),
        HttpResponse.BodyHandlers.ofString()): Unit
      assert(srv2.flush()._1 === 2L)
    } finally srv2.stop()
  }

  test("garbage lines divert to _rejects and never reach the feed segment") {
    val work = tmpDir("http-rejects")
    val srv = graft.sources.HttpFeedServer.start(
      spark, s"$work/feed", feedSchema, flushEvery = Int.MaxValue)
    try {
      val client = HttpClient.newHttpClient()
      def post(path: String, body: String): HttpResponse[String] =
        client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${srv.port}$path"))
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.ofString())
      // 2 valid events + raw garbage + a JSON object missing the key:
      // everything is 202-accepted (ingress contract), but only the valid
      // rows may land in the segment the stream tails
      post("/events", Seq(
        ev(1, "a", Ops.Insert, Seq(1)),
        "this is not json",
        """{"lsn":9,"op":"U","tokens":[1],"n_tok":1,"source":"http"}""", // null doc_id
        ev(2, "b", Ops.Insert, Seq(2))).mkString("\n")): Unit
      val r = post("/flush", "")
      assert(r.statusCode() === 200 && r.body().contains("\"rows\":2"), r.body())
    } finally srv.stop()
    val seg = spark.read.schema(feedSchema).parquet(s"$work/feed/seg=0")
    assert(seg.count() === 2)
    assert(seg.filter(col("doc_id").isNull || col("lsn").isNull).count() === 0)
    val rejects = spark.read.json(s"$work/feed/_rejects/seg=0")
    assert(rejects.count() === 2)
  }
}

/** resolveLatest file-version tie-break must anchor to the LAST /s<v>/
  * path segment — a table root that itself contains one (e.g. /home/s123/
  * warehouse) must not flatten _file_ver (round-4 advice).
  */
class ResolveVersionAnchorSpec extends SparkSpec {
  import spark.implicits._

  private def batchDf(events: Seq[RawEvent]): DataFrame =
    ChangeGen.projectPhase(events.toDF(), Phase(0, Long.MaxValue)).drop("seg")

  test("equal-LSN base-vs-delta conflict resolves newer-commit-wins under an /sN/ root") {
    val root = tmpDir("anchor") + "/s123/tbl"
    val t = LakeTable(root)
    val cfg = MergeConfig(numBuckets = 2, deltaAppendThreshold = 100L)
    def ev(lsn: Long, key: String, tok: Array[Int]) =
      RawEvent(lsn, key, Ops.Upsert, tok, tok.length, "s", null, 0)
    // bootstrap both buckets so the next batch takes the delta path
    MergeInto.apply(spark, t,
      batchDf(Seq(ev(5, "k1", Array(1)), ev(5, "k2", Array(2)), ev(5, "k3", Array(3)))),
      "cp", 0, cfg)
    // delta batch replays k1 at the SAME lsn with different tokens: the
    // kernel's change-wins-ties rule says the newer commit must win
    MergeInto.apply(spark, t, batchDf(Seq(ev(5, "k1", Array(9, 9)))), "cp", 1, cfg)
    assert(t.filesOf(t.currentManifest()).exists(_.isDelta))
    val got = t.read(spark).filter(col("doc_id") === "k1")
      .select("tokens").head().getSeq[Int](0)
    assert(got === Seq(9, 9))
    // and compaction folds to the same winner
    Maintenance.compact(spark, t)
    val folded = t.read(spark).filter(col("doc_id") === "k1")
      .select("tokens").head().getSeq[Int](0)
    assert(folded === Seq(9, 9))
  }
}

/** Driver-side lineage write ([[graft.merge.LineageWriter]]): the per-batch
  * lineage parquet is written without a Spark job but must stay bit-for-bit
  * compatible with the old DataFrame-write layout — partition discovery over
  * `cp=/batch=`, identical column names/types, overwrite-idempotent replays.
  */
class LineageWriterSpec extends SparkSpec {
  import graft.merge.LineageWriter
  import graft.model.LineageRow

  private def rows(snapshot: String) = Seq(
    LineageRow(batch_id = 3L, partition = 0, min_lsn = 10L, max_lsn = 42L,
      n_insert = 5L, n_update = 2L, n_delete = 1L, n_dedup_dropped = 4L,
      snapshot_id = snapshot),
    LineageRow(batch_id = 3L, partition = 5, min_lsn = 11L, max_lsn = 40L,
      n_insert = 0L, n_update = 7L, n_delete = 0L, n_dedup_dropped = 0L,
      snapshot_id = snapshot))

  test("driver-written lineage reads back exactly, with partition discovery") {
    val dir = tmpDir("lineage-direct")
    val conf = spark.sparkContext.hadoopConfiguration
    LineageWriter.write(conf, dir, "cpA", 3L, rows("snap-1"))
    LineageWriter.write(conf, dir, "cpA", 4L, Seq(
      LineageRow(4L, 2, 50L, 60L, 1L, 0L, 0L, 0L, "snap-2")))
    val got = spark.read.parquet(dir)
    // partition columns recovered from the directory layout
    assert(got.columns.toSet ===
      Set("batch_id", "partition", "min_lsn", "max_lsn", "n_insert",
        "n_update", "n_delete", "n_dedup_dropped", "snapshot_id",
        "cp", "batch"))
    val b3 = got.filter(col("batch") === 3).orderBy("partition").collect()
    assert(b3.length === 2)
    val r0 = b3(0)
    assert(r0.getAs[Long]("batch_id") === 3L)
    assert(r0.getAs[Int]("partition") === 0)
    assert(r0.getAs[Long]("min_lsn") === 10L)
    assert(r0.getAs[Long]("max_lsn") === 42L)
    assert(r0.getAs[Long]("n_insert") === 5L)
    assert(r0.getAs[Long]("n_dedup_dropped") === 4L)
    assert(r0.getAs[String]("snapshot_id") === "snap-1")
    assert(r0.getAs[String]("cp") === "cpA")
    assert(got.filter(col("batch") === 4).count() === 1)
  }

  test("replayed write overwrites to identical content; no tmp dirs survive") {
    val dir = tmpDir("lineage-replay")
    val conf = spark.sparkContext.hadoopConfiguration
    LineageWriter.write(conf, dir, "cp", 0L, rows("snap-x"))
    val first = spark.read.parquet(dir).collect().map(_.toString).sorted
    // a crash-replay rewrites the same batch (possibly with a different
    // snapshot id upstream — here identical rows): content must converge
    LineageWriter.write(conf, dir, "cp", 0L, rows("snap-x"))
    val second = spark.read.parquet(dir).collect().map(_.toString).sorted
    assert(first === second)
    val cpDir = new java.io.File(s"$dir/cp=cp")
    assert(cpDir.listFiles().map(_.getName).toSet === Set("batch=0"))
  }
}

/** The manifest-head CAS must hold on the LOCAL filesystem, where Hadoop's
  * rename delegates to POSIX rename(2) and silently REPLACES an existing
  * destination — rename-if-absent is only a CAS on HDFS-like stores. The
  * commit arbitrates local schemes through atomic hard-link creation;
  * this spec races many writers PAST the exists() pre-check (barrier) and
  * asserts exactly one wins and the committed head is the winner's,
  * uncorrupted, every iteration.
  */
class CommitCasLinkSpec extends SparkSpec {
  import graft.table.CommitConflictException
  import scala.jdk.CollectionConverters._

  test("concurrent same-version commits: exactly one winner, head never clobbered") {
    val table = LakeTable(tmpDir("cas-link") + "/t")
    val schemaJson = graft.model.Schemas.seqTable.json
    (1 to 20).foreach { iter =>
      val version = iter.toLong - 1
      val writers = 4
      val barrier = new java.util.concurrent.CyclicBarrier(writers)
      val results = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()
      val threads = (1 to writers).map { w =>
        val snap = s"iter$iter-writer$w"
        val m = Manifest(version, snap, None, schemaJson,
          numBuckets = 4, files = Nil, ledger = Map(s"cp/$version" -> snap))
        val t = new Thread(() => {
          barrier.await() // all writers pass any exists() pre-check together
          try { table.commit(m); results.put(snap, true): Unit }
          catch { case _: CommitConflictException => results.put(snap, false): Unit }
        })
        t.start(); t
      }
      threads.foreach(_.join(30000))
      val winners = results.asScala.filter(_._2).keys.toSeq
      assert(winners.size === 1, s"iter $iter: winners = $winners")
      // the committed head is the winner's, complete and parseable
      val head = table.readManifest(version)
      assert(head.snapshotId === winners.head)
      assert(head.ledger === Map(s"cp/$version" -> winners.head))
    }
    // no .tmp leftovers from losing writers
    val meta = new java.io.File(s"${table.root}/meta")
    assert(meta.listFiles().count(_.getName.startsWith(".tmp-")) === 0)
  }
}
