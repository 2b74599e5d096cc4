package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** CSV ingestion — the reference pipeline's front door
  * (`CSVToJSONProcessor.java:116-226`: quote-aware split regex
  * `sep(?=([^"]*"[^"]*")*[^"]*$)`, header from first line, error on
  * column-count mismatch; `CleanCSVHeader.java:130-157`: header
  * find/replace normalization).
  *
  * Spark-first: the quote-aware parse is the built-in CSV datasource
  * (codegen'd UnivocityParser — per-file-split parallel, no regex per
  * row), header normalization is a rename at the source, and the
  * reference's mismatch-errors path becomes PERMISSIVE mode with
  * `_corrupt_record` routed to a dead-letter frame instead of failing
  * the batch. At 100 TB the parse is embarrassingly parallel per file
  * split and the schema is declared, so no inference pass over the data.
  */
object CsvSource {

  val CORRUPT = "_corrupt_record"

  /** Result of a routed CSV read: parsed rows and the dead-letter side
    * (raw text of every line the parser could not bind to the schema —
    * the reference's FAILURE relationship for column-count mismatch,
    * `CSVToJSONProcessor.java:198-206`).
    *
    * The parsed split is cached: Spark requires the parse to be cached
    * before the corrupt column may be queried on its own
    * (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the cache also makes the
    * two routes read one parse. Call [[RoutedCsv.release]] when done with
    * BOTH frames (a long-running ingest job that never releases leaks one
    * cache entry per read for the session's lifetime); after release the
    * frames must not be reused — corrupt-column-only plans cannot
    * recompute uncached.
    */
  final case class RoutedCsv(good: DataFrame, corrupt: DataFrame,
      private val cached: DataFrame) {
    def release(): Unit = { cached.unpersist(false); () }
  }

  /** Schema-first CSV read, PERMISSIVE, with corrupt records routed.
    *
    * @param schema        declared data schema (without the corrupt column)
    * @param headerFind    regex applied to header names (CleanCSVHeader)
    * @param headerReplace replacement for `headerFind`
    */
  def readRouted(
      spark: SparkSession,
      path: String,
      schema: StructType,
      header: Boolean = true,
      headerFind: String = "",
      headerReplace: String = ""): RoutedCsv = {
    val full = StructType(schema.fields.toIndexedSeq :+
      org.apache.spark.sql.types.StructField(CORRUPT,
        org.apache.spark.sql.types.StringType))
    val raw = spark.read
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CORRUPT)
      // quote-aware: the reference's regex semantics (separator inside
      // quotes is content), plus escaped quotes inside quoted fields
      .option("quote", "\"")
      .option("escape", "\"")
      .schema(full)
      .csv(path)
      // PERMISSIVE parsing is lazy per column: referencing the corrupt
      // column requires the raw line to be retained, so cache the split
      // once and route both ways from it
      .persist()
    val renamed =
      if (headerFind.isEmpty) raw
      else raw.toDF(raw.columns.map(c =>
        if (c == CORRUPT) c else c.replaceAll(headerFind, headerReplace)).toIndexedSeq: _*)
    RoutedCsv(
      good = renamed.filter(col(CORRUPT).isNull).drop(CORRUPT),
      corrupt = renamed.filter(col(CORRUPT).isNotNull).select(col(CORRUPT)),
      cached = raw)
  }
}
