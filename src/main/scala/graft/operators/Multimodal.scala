package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride through the
  * engine as opaque `binary` columns with typed metadata, processed
  * batch-wise per partition. The Spark-side contract (schema, partition
  * sizing, batch iteration) is real and tested. Decode status per format:
  * archive/zip containers (incl. pptx/xlsx/docx) decode for REAL —
  * [[ArchiveDecoder]] here and [[graft.sources.ArchiveSource]] for entry
  * explode + slide text, both JDK-only; image/audio pixel decode remains a
  * deterministic STUB ([[StubDecoder]] — no codecs in this container),
  * swappable behind [[MediaDecoder]] without touching the plumbing.
  *
  * Mirrors the reference's archive-explode sources
  * (`PontusMSOfficePSTReaderRecord.java:242-256`: Tika parse of an opaque
  * blob -> N records with typed metadata; `ExtractMediaMetadata` in the
  * production flow).
  */
object Multimodal {

  /** Typed metadata extracted per media payload. `n_parts` is the number
    * of decodable sub-records (zip entries, frames, pages) — 1 for
    * monolithic formats.
    */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      format: String,
      width: Int,
      height: Int,
      checksum: Long,
      n_parts: Int)

  /** The decode seam. Implementations MUST be pure per-blob functions. */
  trait MediaDecoder extends Serializable {
    def decode(id: Long, payload: Array[Byte]): MediaFeatures
  }

  /** Deterministic fake decoder for IMAGE payloads: derives
    * pseudo-dimensions from content bytes (this container ships no image
    * codecs — swap in a codec-backed implementation in production).
    * Archive/container payloads have a REAL decoder: [[ArchiveDecoder]].
    */
  object StubDecoder extends MediaDecoder {
    def decode(id: Long, payload: Array[Byte]): MediaFeatures = {
      val n = payload.length
      var crc = 1125899906842597L
      var i = 0
      while (i < n) { crc = 31 * crc + (payload(i) & 0xff); i += 1 }
      val fmt = if (n % 3 == 0) "png" else if (n % 3 == 1) "jpeg" else "webp"
      MediaFeatures(id, n, fmt,
        width = 64 + (math.abs(crc) % 1024).toInt,
        height = 64 + (math.abs(crc >> 10) % 1024).toInt,
        checksum = crc,
        n_parts = 1)
    }
  }

  /** REAL JDK-only decoder: format sniffed from magic bytes; zip
    * containers (which pptx/xlsx/docx are) genuinely parsed —
    * `n_parts` = entry count via a streaming zip read, `checksum` =
    * CRC-32 of the payload. Image dimensions stay 0 (no image codecs in
    * this container; that sub-seam remains documented-stub). Pairs with
    * [[graft.sources.ArchiveSource]] for full entry explode.
    */
  object ArchiveDecoder extends MediaDecoder {
    def decode(id: Long, payload: Array[Byte]): MediaFeatures = {
      val crc = new java.util.zip.CRC32()
      crc.update(payload)
      val fmt =
        if (payload.length >= 4 && payload(0) == 'P' && payload(1) == 'K') "zip"
        else if (payload.length >= 8 && (payload(0) & 0xff) == 0x89 &&
          payload(1) == 'P' && payload(2) == 'N' && payload(3) == 'G') "png"
        else if (payload.length >= 3 && (payload(0) & 0xff) == 0xff &&
          (payload(1) & 0xff) == 0xd8) "jpeg"
        else "bin"
      val parts =
        if (fmt == "zip") graft.sources.ArchiveSource.zipEntries(payload).size
        else 1
      MediaFeatures(id, payload.length, fmt, width = 0, height = 0,
        checksum = crc.getValue, n_parts = parts)
    }
  }

  val payloadSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  /** Feature extraction over a binary-payload frame: partition-wise batch
    * iteration (the `mapInPandas` shape, Scala-typed), so a real decoder
    * can amortize model/codec init per partition instead of per row.
    * Media blobs are large: callers should size partitions by bytes
    * (`spark.sql.files.maxPartitionBytes`), not row count.
    */
  def extractFeatures(payloads: DataFrame,
      decoder: MediaDecoder = StubDecoder): Dataset[MediaFeatures] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // per-partition init hook would run here (codec/model warm-up,
        // mirroring the reference's 20-call client warm-up,
        // ClusterClientServiceImpl.java:70-80)
        batch.map { case (id, bytes) =>
          decoder.decode(id, if (bytes == null) Array.emptyByteArray else bytes)
        }
      }
  }

  /** Frame/segment sampling plumbing: explode one payload into N
    * fixed-size byte windows (deterministic), the shape of video
    * frame-sampling or audio segmentation. Pure column ops — no UDF.
    */
  def sampleWindows(payloads: DataFrame, windowBytes: Int, stride: Int): DataFrame =
    payloads.select(col("doc_id"),
      posexplode(split_part_bytes(col("payload"), windowBytes, stride)))
      .withColumnRenamed("pos", "window_idx")
      .withColumnRenamed("col", "window")

  /** Byte-window slices of a binary column as an array column. */
  private def split_part_bytes(payload: org.apache.spark.sql.Column,
      windowBytes: Int, stride: Int) = {
    val n = length(payload)
    when(n.isNull || n === 0, array().cast("array<binary>"))
      .otherwise(transform(
        // Column./ is double division — floor+cast for the window count
        sequence(lit(0), greatest(floor((n - 1) / lit(stride)).cast("int"), lit(0))),
        i => substring(payload, (i * stride + 1).cast("int"), lit(windowBytes))))
  }
}
