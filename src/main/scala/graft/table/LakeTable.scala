package graft.table

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s._
import org.json4s.jackson.Serialization

import java.nio.charset.StandardCharsets
import java.util.UUID

/** One immutable data file registered in a snapshot manifest.
  * `bucket` is the key-partition it belongs to (bucket = pmod(xxhash64(doc_id), numBuckets));
  * `minLsn`/`maxLsn`/`rows` are file-level stats used for scan pruning —
  * the Spark-native analog of the reference pushing its filter into the
  * keyed store instead of scanning client-side
  * (reference `PontusIdGenerator.java:68-76,299`).
  */
final case class FileEntry(
    path: String,
    bucket: Int,
    rows: Long,
    minLsn: Long,
    maxLsn: Long,
    /** Merge-on-read delta: true for files APPENDED by a trickle-batch
      * commit without rewriting the bucket — they may carry newer
      * versions of keys that also live in the bucket's base file, plus
      * tombstones; readers resolve last-writer-wins at scan time
      * ([[LakeTable.resolveLatest]]) and compaction folds deltas back
      * into one base file per bucket.
      */
    isDelta: Boolean = false)

/** One immutable per-bucket-range manifest file referenced from a
  * snapshot's manifest list: `path` is the file's name under `meta/`,
  * `range` its bucket-range id (`LakeTable.rangeOf`), `minBucket`/
  * `maxBucket` the range's bucket span and `minLsn`/`maxLsn`/`nFiles`/
  * `rows` aggregate stats for list-level pruning — a reader (or an
  * LSN-range scan) can skip whole ranges without opening them.
  */
final case class ManifestRef(
    path: String,
    range: Int,
    minBucket: Int,
    maxBucket: Int,
    nFiles: Int,
    rows: Long,
    minLsn: Long,
    maxLsn: Long)

/** Content of one manifest file (kept as a wrapper object so the JSON
  * stays self-describing and extensible).
  */
final case class ManifestFile(files: Seq[FileEntry])

/** A snapshot of the table: manifest LIST + schema + commit ledger.
  *
  * The file listing lives in immutable per-bucket-range manifest files
  * (`manifests`), Iceberg-style: a commit rewrites only the ranges its
  * batch touched plus this small head document — O(touched ranges + 1)
  * metadata I/O instead of O(all files) — and untouched ranges' manifest
  * files are SHARED across snapshots, so retained time-travel history
  * costs O(changed ranges), not O(files x snapshots). `files` is the
  * legacy inline listing (pre-manifest-list snapshots deserialize into
  * it); list-based snapshots leave it empty and readers go through
  * `LakeTable.filesOf`.
  *
  * `ledger` maps "checkpointId/batchId" -> snapshotId and makes commits
  * idempotent under streaming replay: re-running a batch that already
  * committed is a no-op (the exactly-once upgrade of the reference's
  * at-least-once commit/rollback, `PontusIdGenerator.java:361-378`,
  * modeled on the version-checked ZK update in
  * `JWTStoreClientProcessor.java:165-168`).
  *
  * The ledger is RETAINED, not unbounded: at 10^5+ micro-batches a full
  * per-batch map would make every commit rewrite O(all history) (O(n^2)
  * cumulative commit I/O). Older entries compact into `floorBatch`
  * (checkpointId -> highest compacted-away batchId); because a stream
  * engine assigns batchIds monotonically per checkpoint, any batchId at
  * or below the floor is by construction already committed, so the
  * idempotence decision stays exact with O(retention) manifest bytes.
  */
final case class Manifest(
    version: Long,
    snapshotId: String,
    parentSnapshotId: Option[String],
    schemaJson: String,
    numBuckets: Int,
    files: Seq[FileEntry],
    ledger: Map[String, String],
    floorBatch: Map[String, Long] = Map.empty,
    manifests: Seq[ManifestRef] = Nil) {
  def schema: StructType = DataType.fromJson(schemaJson).asInstanceOf[StructType]

  /** Was (checkpointId, batchId) already committed? Exact under the
    * monotonic-batchId invariant; `snapshotIdOf` is only known for
    * entries still inside the retention window.
    */
  def isCommitted(checkpointId: String, batchId: Long): Boolean =
    ledger.contains(s"$checkpointId/$batchId") ||
      floorBatch.get(checkpointId).exists(batchId <= _)

  def snapshotIdOf(checkpointId: String, batchId: Long): Option[String] =
    ledger.get(s"$checkpointId/$batchId")
}

object Manifest {
  /** Compact `ledger` down to at most `retention` newest batchIds per
    * checkpoint, folding everything older into the floor map.
    */
  def compactLedger(ledger: Map[String, String], floor: Map[String, Long],
      retention: Int): (Map[String, String], Map[String, Long]) = {
    val parsed = ledger.toSeq.map { case (k, v) =>
      val i = k.lastIndexOf('/')
      (k.substring(0, i), k.substring(i + 1).toLong, k, v)
    }
    val byCp = parsed.groupBy(_._1)
    val kept = Map.newBuilder[String, String]
    var newFloor = floor
    byCp.foreach { case (cp, entries) =>
      val sorted = entries.sortBy(-_._2)
      sorted.take(retention).foreach(e => kept += (e._3 -> e._4))
      val dropped = sorted.drop(retention)
      if (dropped.nonEmpty) {
        val hi = dropped.map(_._2).max
        newFloor = newFloor.updated(cp, newFloor.getOrElse(cp, Long.MinValue).max(hi))
      }
    }
    (kept.result(), newFloor)
  }
}

/** Thrown when a CAS commit loses the race (another writer committed the
  * same version first). Callers re-read and retry.
  */
final class CommitConflictException(msg: String) extends RuntimeException(msg)

/** Minimal Iceberg-style table: immutable Parquet data files + JSON
  * manifest per snapshot + atomic compare-and-swap commit.
  *
  * Layout under `root`:
  * {{{
  *   meta/v%020d.json     one manifest per snapshot; highest version = current
  *   data/s<version>/...  data files staged per committing snapshot
  * }}}
  *
  * The CAS is a rename: manifests are written to a temp name then renamed to
  * `v%020d.json`; Hadoop `FileSystem.rename` fails when the destination
  * exists (local FS and HDFS), so exactly one writer wins each version.
  * Works identically on a 1000-executor cluster over HDFS/S3A-with-rename
  * semantics and on local[N].
  *
  * == Manifest list (the metadata scale path) ==
  * The per-version document is a MANIFEST LIST: the head (`v*.json`)
  * holds schema/ledger/stats plus references to immutable per-bucket-range
  * manifest files (`m-*.json`, each listing its bucket range's data files
  * + stats). A commit writes new manifest files ONLY for the ranges its
  * batch touched and carries the rest by reference — O(touched ranges +
  * 1) metadata I/O per commit instead of O(all files) — with the CAS
  * unchanged (manifest files are orphans until the head rename wins).
  * Readers prune at the list level by bucket/LSN range before opening
  * per-range manifests ([[filesOf]]), and untouched ranges' manifest
  * files are shared across retained snapshots, so time-travel history
  * costs O(changed ranges) per snapshot. At 10^5+ files (numBuckets =
  * 2^14, retained snapshots) the head stays a few KB and a trickle
  * commit rewrites one range instead of a multi-MB listing. Bucket space
  * splits into `min(numBuckets, 64)` ranges — fine enough that a
  * 1-bucket commit rewrites ~1/64 of the metadata, coarse enough that a
  * full-spread batch writes at most 64 small files. Pre-list snapshots
  * (inline `files`) stay readable; their first post-upgrade commit
  * migrates them to ranges.
  */
final class LakeTable private (val root: String, val conf: Configuration) {

  private implicit val fmts: Formats = DefaultFormats

  private val rootPath = new Path(root)
  private val metaDir = new Path(rootPath, "meta")
  private def fs: FileSystem = rootPath.getFileSystem(conf)

  private def manifestPath(version: Long): Path =
    new Path(metaDir, f"v$version%020d.json")

  private def hintPath: Path = new Path(metaDir, "version-hint.text")

  // ---- snapshot log ----------------------------------------------------

  /** Highest committed version, or -1 if the table has no snapshot yet.
    *
    * Fast path: a non-authoritative `version-hint.text` + an upward
    * existence probe — O(1) metadata ops in steady state instead of a
    * directory LISTING per read. The listing-per-read was the last
    * per-batch O(history) term: at 10^5 commits `meta/` holds 10^5 head
    * documents plus the manifest files, and a streaming driver calls this
    * every micro-batch (on an object store that is a LIST per batch).
    * The hint is best-effort: written after each commit, may be stale
    * (probe catches up), corrupt, or missing (authoritative listing
    * fallback) — correctness never depends on it.
    */
  def currentVersion(): Long = {
    val f = fs
    val hinted =
      try {
        if (!f.exists(hintPath)) None
        else {
          val in = f.open(hintPath)
          val s =
            try new String(org.apache.commons.io.IOUtils.toByteArray(in),
              StandardCharsets.UTF_8).trim
            finally in.close()
          s.toLongOption
        }
      } catch { case _: Exception => None }
    hinted match {
      case Some(h) if h >= 0 && f.exists(manifestPath(h)) =>
        var v = h
        while (f.exists(manifestPath(v + 1))) v += 1
        v
      case _ => listedVersion()
    }
  }

  /** Authoritative fallback: list `meta/` for the highest head. */
  private def listedVersion(): Long = {
    val f = fs
    if (!f.exists(metaDir)) return -1L
    val vs = f.listStatus(metaDir).iterator.map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.stripPrefix("v").stripSuffix(".json").toLong)
    if (vs.isEmpty) -1L else vs.max
  }

  def currentManifest(): Manifest = {
    val v = currentVersion()
    require(v >= 0, s"table at $root has no committed snapshot")
    readManifest(v)
  }

  def currentManifestOpt(): Option[Manifest] = {
    val v = currentVersion()
    if (v < 0) None else Some(readManifest(v))
  }

  def readManifest(version: Long): Manifest = {
    val in = fs.open(manifestPath(version))
    try {
      val bytes = org.apache.commons.io.IOUtils.toByteArray(in)
      Serialization.read[Manifest](new String(bytes, StandardCharsets.UTF_8))
    } finally in.close()
  }

  // ---- manifest list ---------------------------------------------------

  /** Data files of snapshot `m`, resolved through the manifest list with
    * list-level pruning: when `buckets` is given, only manifest files
    * whose bucket range intersects it are opened (and their entries
    * filtered). Legacy inline-`files` snapshots resolve directly.
    */
  def filesOf(m: Manifest, buckets: Option[Set[Int]] = None): Seq[FileEntry] = {
    val entries =
      if (m.manifests.isEmpty) m.files
      else {
        val refs = buckets match {
          case Some(bs) =>
            m.manifests.filter(r => bs.exists(b => b >= r.minBucket && b <= r.maxBucket))
          case None => m.manifests
        }
        refs.sortBy(_.range).flatMap(readManifestFile)
      }
    buckets match {
      case Some(bs) => entries.filter(f => bs.contains(f.bucket))
      case None => entries
    }
  }

  /** Read one manifest file's entries (immutable content — cached JVM-wide
    * by name, so a streaming driver re-reads only the ranges each commit
    * actually rewrote).
    */
  def readManifestFile(ref: ManifestRef): Seq[FileEntry] = {
    val cached = LakeTable.manifestCache.get(ref.path)
    if (cached != null) return cached
    val in = fs.open(new Path(metaDir, ref.path))
    val entries =
      try Serialization.read[ManifestFile](new String(
        org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8)).files
      finally in.close()
    LakeTable.manifestCache.putBounded(ref.path, entries)
    entries
  }

  /** Write one immutable manifest file for `range`; returns its ref.
    * The file is an orphan until a head referencing it wins the CAS.
    */
  private def writeManifestFile(range: Int, numBuckets: Int,
      entries: Seq[FileEntry]): ManifestRef = {
    val name = s"m-${UUID.randomUUID()}.json"
    val out = fs.create(new Path(metaDir, name), false)
    try out.write(Serialization.write(ManifestFile(entries))
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val (lo, hi) = LakeTable.rangeSpan(range, numBuckets)
    val ref = ManifestRef(
      path = name, range = range, minBucket = lo, maxBucket = hi,
      nFiles = entries.size, rows = entries.map(_.rows).sum,
      minLsn = entries.map(_.minLsn).minOption.getOrElse(Long.MaxValue),
      maxLsn = entries.map(_.maxLsn).maxOption.getOrElse(Long.MinValue))
    LakeTable.manifestCache.putBounded(name, entries.toIndexedSeq)
    ref
  }

  /** Compose the next snapshot's manifest list: ranges intersecting
    * `touched` buckets (or receiving `newFiles`) are rewritten — their
    * content = parent entries of UNtouched buckets in the range plus the
    * new files — and every other range's manifest file carries over by
    * reference, untouched and unread. A legacy inline-`files` parent (or
    * no parent) regroups everything into ranges once.
    */
  def composeManifests(parent: Option[Manifest], touched: Set[Int],
      newFiles: Seq[FileEntry], numBuckets: Int): Seq[ManifestRef] = {
    fs.mkdirs(metaDir)
    val rng: Int => Int = LakeTable.rangeOf(_, numBuckets)
    val newByRange = newFiles.groupBy(f => rng(f.bucket))
    val legacy = parent.exists(m => m.manifests.isEmpty && m.files.nonEmpty)
    // manifest files are independent — write them concurrently (a serial
    // loop of N small FS creates is pure latency on the per-batch commit
    // path; measured ~130 ms/commit at 32 ranges on local FS, worse on an
    // object store)
    def writeAll(ranges: Seq[(Int, Seq[FileEntry])]): Seq[ManifestRef] = {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.global
      Await.result(
        Future.sequence(ranges.map { case (r, es) =>
          Future(writeManifestFile(r, numBuckets, es))
        }), Duration.Inf)
    }
    if (parent.isEmpty || legacy) {
      val all = parent.map(_.files).getOrElse(Nil)
        .filterNot(f => touched.contains(f.bucket)) ++ newFiles
      writeAll(all.groupBy(f => rng(f.bucket)).toSeq.sortBy(_._1))
    } else {
      val parentRefs = parent.get.manifests.map(r => r.range -> r).toMap
      val touchedRanges = touched.map(rng) ++ newByRange.keySet
      val carried = parent.get.manifests.filterNot(r => touchedRanges.contains(r.range))
      val rewritten = writeAll(touchedRanges.toSeq.sorted.flatMap { r =>
        val kept = parentRefs.get(r).map(readManifestFile).getOrElse(Nil)
          .filterNot(f => touched.contains(f.bucket))
        val content = kept ++ newByRange.getOrElse(r, Nil)
        if (content.isEmpty) None else Some(r -> content)
      })
      (carried ++ rewritten).sortBy(_.range)
    }
  }

  /** Atomic CAS commit of `m` at `m.version`. Exactly one concurrent caller
    * can commit a given version; losers get [[CommitConflictException]].
    */
  def commit(m: Manifest): Unit = {
    val f = fs
    f.mkdirs(metaDir)
    val target = manifestPath(m.version)
    if (f.exists(target))
      throw new CommitConflictException(s"version ${m.version} already committed")
    val tmp = new Path(metaDir, s".tmp-${UUID.randomUUID()}.json")
    val out = f.create(tmp, false)
    try out.write(Serialization.write(m).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // The CAS. On HDFS-like stores rename-if-absent is atomic and fails
    // when the target exists. On the LOCAL filesystem it is NOT a CAS:
    // Hadoop's RawLocalFileSystem.rename delegates to File.renameTo =
    // POSIX rename(2), which silently REPLACES an existing destination —
    // two racers passing the exists() pre-check would both "win" and the
    // loser's head would clobber the winner's (losing its ledger entry =>
    // a replayed batch re-applies). So local schemes arbitrate through
    // hard-link creation instead: link(2) is atomic and fails with EEXIST
    // when the target exists. A crash between link and tmp-delete leaves
    // only an orphaned .tmp-* file (no liveness impact, vacuumable).
    // scheme from the RESOLVED FileSystem, not the (possibly scheme-less)
    // Path: a bare /warehouse/t path on a cluster whose fs.defaultFS is
    // HDFS must take the rename branch — the tmp file lives on HDFS, and
    // local java.nio paths would not exist
    val scheme = Option(f.getUri.getScheme).getOrElse("file")
    val won =
      if (scheme == "file") {
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(target.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          f.delete(tmp, false)
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
            // mount without link(2) support (FAT/exFAT, CIFS without unix
            // extensions): fall back to rename-if-absent — functional, but
            // only a true CAS on stores that honor dest-must-not-exist
            System.err.println("[graft] WARN: hard links unsupported under " +
              s"$metaDir; commit CAS falls back to rename-if-absent, which " +
              "POSIX rename(2) does not arbitrate — avoid concurrent " +
              "writers on this mount")
            f.rename(tmp, target)
        }
      } else f.rename(tmp, target)
    if (!won) {
      f.delete(tmp, false)
      throw new CommitConflictException(
        s"lost CAS race committing version ${m.version}")
    }
    // best-effort hint refresh AFTER the CAS: concurrent writers race
    // (last write wins), a crash can leave it stale or torn — all safe,
    // currentVersion probes upward and falls back to the listing
    try {
      val out = f.create(hintPath, true)
      try out.write(m.version.toString.getBytes(StandardCharsets.UTF_8))
      finally out.close()
    } catch { case _: Exception => () }
  }

  /** Already-committed snapshot for this (checkpointId, batchId), if any —
    * the idempotence lookup done at the top of every foreachBatch. A batch
    * compacted below the ledger floor reports the CURRENT snapshot (it is
    * committed; its own snapshot id is outside the retention window).
    */
  def committedSnapshot(checkpointId: String, batchId: Long): Option[String] =
    currentManifestOpt().flatMap { m =>
      m.snapshotIdOf(checkpointId, batchId)
        .orElse(if (m.isCommitted(checkpointId, batchId)) Some(m.snapshotId) else None)
    }

  // ---- data files ------------------------------------------------------

  /** Directory where a committing snapshot stages its data files. Files are
    * immutable once the manifest referencing them is committed; a lost CAS
    * race leaves orphans that a vacuum can collect (never referenced).
    */
  def stagingDir(version: Long): String =
    new Path(new Path(rootPath, "data"), s"s$version").toString

  /** List the parquet files Spark wrote under `dir/_bucket=N/`, with
    * per-bucket stats attached to each file.
    */
  def enumerateStaged(dir: String, stats: Map[Int, (Long, Long, Long)],
      isDelta: Boolean = false): Seq[FileEntry] = {
    val f = fs
    val d = new Path(dir)
    if (!f.exists(d)) return Nil
    f.listStatus(d).toIndexedSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("_bucket="))
      .flatMap { bdir =>
        val bucket = bdir.getPath.getName.stripPrefix("_bucket=").toInt
        val (rows, minL, maxL) = stats.getOrElse(bucket, (0L, Long.MaxValue, Long.MinValue))
        f.listStatus(bdir.getPath).toIndexedSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .map(s => FileEntry(s.getPath.toString, bucket, rows, minL, maxL, isDelta))
      }
  }

  /** Enumerate staged files with EXACT per-file (rows, lsn min/max) read
    * from the parquet FOOTERS — driver-side, parallel, no Spark job. The
    * footer statistics are what the write itself recorded; harvesting
    * them costs one small ranged read per file instead of a cluster pass
    * over the staged data (the read-back job this replaces was a fixed
    * per-commit cost on the serial path — the Amdahl term the scaling
    * north rule keeps paying). A footer that lacks `lsn` statistics for a
    * non-empty file (foreign writer) gets UNPRUNABLE bounds
    * (Long.MinValue/Long.MaxValue) — never the empty-file sentinel, which
    * would let LSN pruning skip live data.
    */
  def enumerateStagedWithStats(dir: String,
      isDelta: Boolean = false): Seq[FileEntry] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val listed = enumerateStaged(dir, Map.empty, isDelta)
    Await.result(
      Future.sequence(listed.map { e =>
        Future {
          val (rows, minL, maxL) = footerStats(new Path(e.path))
          e.copy(rows = rows, minLsn = minL, maxLsn = maxL)
        }
      }), Duration.Inf)
  }

  /** (rows, min lsn, max lsn) of one parquet file from its footer. */
  private def footerStats(p: Path): (Long, Long, Long) = {
    import scala.jdk.CollectionConverters._
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
    try {
      val blocks = r.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      if (rows == 0L) return (0L, Long.MaxValue, Long.MinValue)
      var minL = Long.MaxValue
      var maxL = Long.MinValue
      var sawStats = true
      blocks.foreach { b =>
        b.getColumns.asScala.find(_.getPath.toDotString == "lsn") match {
          case Some(c) if c.getStatistics != null &&
              !c.getStatistics.isEmpty && c.getStatistics.hasNonNullValue =>
            (c.getStatistics.genericGetMin, c.getStatistics.genericGetMax) match {
              case (lo: java.lang.Long, hi: java.lang.Long) =>
                if (lo < minL) minL = lo
                if (hi > maxL) maxL = hi
              case _ => sawStats = false
            }
          case _ => sawStats = false
        }
      }
      if (sawStats) (rows, minL, maxL)
      else (rows, Long.MinValue, Long.MaxValue)
    } finally r.close()
  }

  // ---- read path -------------------------------------------------------

  /** Read the current table state (live rows only — delete tombstones are
    * filtered out and the tombstone flag dropped). `buckets`, when given,
    * prunes the scan to those key-partitions (manifest-stat file pruning —
    * no Spark task touches the untouched buckets). Old files missing
    * newly-ADDed columns null-fill because the read is schema-first; files
    * written before an int->long widening read back widened (Parquet type
    * promotion, Spark 4).
    */
  def read(spark: SparkSession, buckets: Option[Set[Int]] = None): DataFrame = {
    currentManifestOpt() match {
      case None =>
        readStored(spark, buckets)
          .filter(!col(LakeTable.TOMBSTONE)).drop(LakeTable.TOMBSTONE)
      case Some(m) =>
        val stored = LakeTable.storedSchema(m.schema)
        scanResolved(spark, stored, filesOf(m, buckets))
          .filter(!col(LakeTable.TOMBSTONE)).drop(LakeTable.TOMBSTONE)
    }
  }

  /** Scan `files` with the LWW resolution applied ONLY to buckets that
    * actually contain delta files — delta-free buckets scan plain, no
    * window, no shuffle. At scale deltas concentrate in recently-written
    * buckets; reading the whole table must not pay a resolution exchange
    * for the compacted majority.
    *
    * `singlePartition` coalesces each scan to one partition BELOW the
    * resolution window, so SinglePartition satisfies its clustering
    * requirement and even the delta-bearing buckets resolve with no
    * Exchange — for callers (small-batch merge, small-table compaction)
    * that already know from the manifest stats the whole scan fits one
    * task. Results are identical; only the partitioning changes.
    */
  def scanResolved(spark: SparkSession, stored: StructType,
      files: Seq[FileEntry], singlePartition: Boolean = false): DataFrame = {
    def scan(fs: Seq[FileEntry]): DataFrame = {
      val df =
        if (fs.isEmpty)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stored)
        else spark.read.schema(stored).parquet(fs.map(_.path): _*)
      if (singlePartition) df.coalesce(1) else df
    }
    val deltaBuckets = files.filter(_.isDelta).map(_.bucket).toSet
    if (deltaBuckets.isEmpty) scan(files)
    else {
      val (affected, plain) = files.partition(f => deltaBuckets.contains(f.bucket))
      val resolved = LakeTable.resolveLatest(scan(affected))
      if (plain.isEmpty) resolved
      else {
        val all = resolved.unionByName(scan(plain))
        // the union re-fans to 2 partitions; honor the contract here so
        // callers need no per-site re-coalesce
        if (singlePartition) all.coalesce(1) else all
      }
    }
  }

  /** Time travel: live rows as of snapshot `version` (every manifest is
    * immutable and self-contained, so this is just a read of an older
    * file listing — until a vacuum retires it).
    */
  def readVersion(spark: SparkSession, version: Long): DataFrame = {
    val m = readManifest(version)
    val stored = LakeTable.storedSchema(m.schema)
    scanResolved(spark, stored, filesOf(m))
      .filter(!col(LakeTable.TOMBSTONE)).drop(LakeTable.TOMBSTONE)
  }

  /** Read the physical table state including tombstone rows. */
  def readStored(spark: SparkSession, buckets: Option[Set[Int]] = None): DataFrame = {
    currentManifestOpt() match {
      case None =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          LakeTable.storedSchema(graft.model.Schemas.seqTable))
      case Some(m) =>
        val stored = LakeTable.storedSchema(m.schema)
        val files = filesOf(m, buckets)
        if (files.isEmpty)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stored)
        else
          spark.read.schema(stored).parquet(files.map(_.path): _*)
    }
  }

  /** Files of the current snapshot whose LSN range intersects [lo, hi] —
    * min/max-stat pruning for time-travel style scans, applied at the
    * manifest-LIST level first (whole ranges skip unopened).
    */
  def filesInLsnRange(lo: Long, hi: Long): Seq[FileEntry] =
    currentManifestOpt().map { m =>
      val entries =
        if (m.manifests.isEmpty) m.files
        else m.manifests.filter(r => r.maxLsn >= lo && r.minLsn <= hi)
          .sortBy(_.range).flatMap(readManifestFile)
      entries.filter(f => f.maxLsn >= lo && f.minLsn <= hi)
    }.getOrElse(Nil)
}

object LakeTable {

  /** Row-count ceiling under which a table-layer rewrite (merge batch,
    * compaction, rebucket) plans as ONE exchange-free single-task stage —
    * the shared default behind `MergeConfig.singleTaskRows` and the
    * maintenance rewrites, kept in one place so the rule cannot drift
    * between call sites. Scale-adaptive logic, not a local-mode constant:
    * at any cluster size a sub-100k-row job is scheduling-floor-bound,
    * and one task bounded by this count cannot skew or spill.
    */
  val SingleTaskRows: Long = 100000L

  /** Bucket ranges per table: fine enough that a 1-bucket commit rewrites
    * ~1/64 of the metadata, coarse enough that a full-spread batch writes
    * at most 64 small manifest files.
    */
  def numRangesFor(numBuckets: Int): Int = math.min(numBuckets, 64)

  /** Range id of a bucket (contiguous equal-width ranges). */
  def rangeOf(bucket: Int, numBuckets: Int): Int =
    (bucket.toLong * numRangesFor(numBuckets) / numBuckets).toInt

  /** Inclusive bucket span [min, max] of a range. */
  def rangeSpan(range: Int, numBuckets: Int): (Int, Int) = {
    val nr = numRangesFor(numBuckets)
    val lo = math.ceil(range.toDouble * numBuckets / nr).toInt
    val hi = math.ceil((range + 1).toDouble * numBuckets / nr).toInt - 1
    (lo, hi)
  }

  /** JVM-wide cache of manifest-file contents. Entries are immutable once
    * written (new content always gets a new name), so caching by name is
    * safe across LakeTable instances; bounded by wholesale clear — a rare
    * event that only costs re-reads.
    */
  private[table] object manifestCache {
    private val m = new java.util.concurrent.ConcurrentHashMap[String, Seq[FileEntry]]()
    def get(k: String): Seq[FileEntry] = m.get(k)
    def putBounded(k: String, v: Seq[FileEntry]): Unit = {
      if (m.size > 4096) m.clear()
      m.put(k, v): Unit
    }
  }

  /** Resolve multi-version stored rows (base + merge-on-read delta files)
    * to the winning version per key: highest `lsn` wins, and on equal
    * LSNs the row from the NEWER data file (higher staging version in
    * the file path) wins — mirroring the merge kernel's
    * change-wins-ties rule (`c.lsn >= t.lsn`). Whole-stage-codegen'd
    * window; Spark 4 plans the rn=1 filter with a map-side
    * WindowGroupLimit, so a hot key never concentrates its versions on
    * one task before partial top-1 pruning.
    */
  def resolveLatest(df: DataFrame): DataFrame = {
    // greedy ".*" prefix anchors the match to the LAST /s<digits>/ path
    // segment — the staging dir (data/s<version>/_bucket=N/...), never an
    // earlier coincidental segment in the table root (e.g. /home/s123/...),
    // which would flatten _file_ver and make equal-LSN base-vs-delta ties
    // nondeterministic instead of newer-commit-wins
    val ver = regexp_extract(input_file_name(), ".*/s([0-9]+)/", 1).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("lsn").desc, col("_file_ver").desc)
    df.withColumn("_file_ver", ver)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_file_ver")
  }

  /** System column marking delete tombstones in stored files. Tombstones
    * keep the delete's LSN so an out-of-order older event in a later batch
    * cannot resurrect a deleted key.
    */
  val TOMBSTONE = "_tombstone"

  /** Physical (stored) schema = logical schema + tombstone flag. */
  def storedSchema(logical: StructType): StructType =
    StructType(logical.fields.toIndexedSeq :+
      org.apache.spark.sql.types.StructField(TOMBSTONE,
        org.apache.spark.sql.types.BooleanType, nullable = false))

  def apply(root: String, conf: Configuration = new Configuration()): LakeTable =
    new LakeTable(root, conf)

  /** Bucket assignment expression: stable hash-partitioning of the merge key.
    * xxhash64 is deterministic across Spark versions/executors.
    */
  def bucketExpr(numBuckets: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(col("doc_id")), lit(numBuckets.toLong)).cast("int")
}
