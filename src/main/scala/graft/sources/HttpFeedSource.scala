package graft.sources

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** Minimal HTTP change-feed receiver — the engine-side re-expression of
  * the reference flow's HTTP ingress (`HandleHttpRequest` /
  * `HandleHttpResponse`, used in the production flow to accept records
  * over HTTP and route them into the graph pipeline). JDK-only
  * (`com.sun.net.httpserver`, no added dependencies).
  *
  * Design: HTTP is an INGRESS EDGE, not a special in-engine source. The
  * receiver buffers posted change events and flushes them as ordinary
  * LSN-ordered parquet feed segments under `feedDir/seg=N/` — exactly the
  * WAL-shaped contract [[graft.stream.CdcStream]] tails — so the whole
  * downstream path (admission, MERGE kernel, exactly-once ledger,
  * checkpoint resume) is identical whether events arrive by file drop,
  * generator, or HTTP. At scale this is the right shape: receivers are
  * stateless and horizontally shardable (each writes its own segment
  * files), and the streaming job never couples to request latency.
  *
  * Endpoints:
  *   - `POST /events` — body = JSON lines, one change event per line;
  *     202, events buffered (auto-flush at `flushEvery`).
  *   - `POST /flush`  — force the buffer out as the next segment; 200
  *     with `{"seg":N,"rows":K}` (or `{"seg":-1,"rows":0}` on empty).
  *   - `GET  /health` — 200 "ok".
  *
  * The client-side fetch (`GetHTTP`) is permanently out of scope: pulling
  * remote URLs is an ops/deployment concern ahead of the feed contract,
  * not an engine operator (ruling recorded in COVERAGE.md).
  */
final class HttpFeedServer private (
    server: HttpServer,
    spark: SparkSession,
    feedDir: String,
    schema: StructType,
    flushEvery: Int) {

  private val buf = mutable.ArrayBuffer.empty[String]
  private var nextSeg: Long = {
    // resume numbering after existing segments (receiver restarts append).
    // Through the Hadoop FS, not java.io.File: segments are written via
    // Spark's FS, and a receiver whose feedDir is remote (hdfs://, s3a://)
    // must not silently restart at seg=0 and overwrite existing data.
    val p = new org.apache.hadoop.fs.Path(feedDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else fs.listStatus(p).toIndexedSeq
      .map(_.getPath.getName).filter(_.startsWith("seg="))
      .flatMap(n => n.stripPrefix("seg=").toLongOption)
      .maxOption.map(_ + 1).getOrElse(0L)
  }

  def port: Int = server.getAddress.getPort

  /** Flush buffered events as the next feed segment; returns (seg, rows)
    * or (-1, 0) when the buffer is empty. Synchronized with ingestion so
    * a segment is a consistent prefix of what was posted. The buffer is
    * cleared only AFTER the segment write succeeds: events acknowledged
    * with 202 must survive a failed flush (disk full, transient FS error)
    * and go out with the next one — a throwing flush loses nothing.
    *
    * Lines that do not parse into a feed event with a non-null (lsn,
    * doc_id) are diverted to `feedDir/_rejects/seg=N` instead of the
    * segment (the dead-letter posture of the CSV source): the stream only
    * tails `seg=*` dirs, so accepted garbage can neither crash the tail
    * nor merge as a null-keyed live row.
    */
  def flush(): (Long, Long) = synchronized {
    if (buf.isEmpty) return (-1L, 0L)
    val lines = buf.toIndexedSeq
    val seg = nextSeg
    import spark.implicits._
    val ds: Dataset[String] = spark.createDataset(lines)
    val withCorrupt = StructType(schema.fields.toIndexedSeq :+
      StructField("_corrupt_record", org.apache.spark.sql.types.StringType))
    val df = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(ds)
      .cache()
    try {
      val badPred = col("_corrupt_record").isNotNull ||
        col("lsn").isNull || col("doc_id").isNull
      val bad = df.filter(badPred)
      val nBad = bad.count()
      if (nBad > 0)
        bad.coalesce(1).write.mode("overwrite")
          .json(s"$feedDir/_rejects/seg=$seg")
      val good = df.filter(!badPred).drop("_corrupt_record")
      // LSN order inside the single segment file: coalesce(1) THEN a
      // within-partition sort — a global orderBy plans a range exchange
      // whose boundary-sampling pass is a whole extra Spark job per flush
      // for a one-file result the local sort produces identically
      good.coalesce(1).sortWithinPartitions(col("lsn"))
        .write.mode("overwrite").parquet(s"$feedDir/seg=$seg")
      // only now is the segment durable: advance + drop the buffer
      nextSeg += 1
      buf.clear()
      (seg, lines.length.toLong - nBad)
    } finally df.unpersist(false): Unit
  }

  private def ingest(body: String): Int = {
    val lines = body.linesIterator.map(_.trim).filter(_.nonEmpty).toIndexedSeq
    val doFlush = synchronized {
      buf ++= lines
      buf.length >= flushEvery
    }
    if (doFlush) flush(): Unit
    lines.length
  }

  private def handler: HttpHandler = (ex: HttpExchange) => {
    // headers can be sent at most once per exchange: a failure AFTER the
    // happy-path respond must not try to respond again (sendResponseHeaders
    // would throw out of the handler and the client would see a reset)
    var responded = false
    def respond(code: Int, body: String): Unit = {
      responded = true
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(code, bytes.length.toLong)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    }
    // exception messages carry quotes/newlines (Spark analysis errors
    // routinely do) — escape them or the error body is invalid JSON
    def jsonStr(s: String): String = graft.util.IoUtil.jsonString(s)
    try {
      (ex.getRequestMethod, ex.getRequestURI.getPath) match {
        case ("POST", "/events") =>
          val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          val n = ingest(body)
          respond(202, s"""{"accepted":$n}""")
        case ("POST", "/flush") =>
          val (seg, rows) = flush()
          respond(200, s"""{"seg":$seg,"rows":$rows}""")
        case ("GET", "/health") => respond(200, """{"status":"ok"}""")
        case _ => respond(404, """{"error":"not found"}""")
      }
    } catch {
      case e: Exception if !responded =>
        respond(500, s"""{"error":${jsonStr(e.getMessage)}}""")
    }
  }

  def stop(): Unit = server.stop(0)
}

object HttpFeedServer {

  /** Start a receiver on `port` (0 = ephemeral) writing segments of
    * `schema`-shaped change events under `feedDir`.
    */
  def start(spark: SparkSession, feedDir: String, schema: StructType,
      port: Int = 0, flushEvery: Int = 100000): HttpFeedServer = {
    new java.io.File(feedDir).mkdirs()
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    val s = new HttpFeedServer(server, spark, feedDir, schema, flushEvery)
    server.createContext("/", s.handler)
    server.setExecutor(null) // serial dispatch; segment writes serialize anyway
    server.start()
    s
  }
}
