package graft.stream

import graft.merge.{MergeConfig, MergeInto}
import graft.table.LakeTable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Configuration of a CDC tail job.
  *
  * @param feedDir           directory of LSN-ordered change-feed parquet
  *                          segments (the binlog/WAL being tailed)
  * @param tableDir          LakeTable root to merge into
  * @param checkpointDir     Structured Streaming checkpoint location
  * @param checkpointId      stable id naming this stream in the table's
  *                          idempotence ledger (survives restarts)
  * @param maxFilesPerTrigger admission cap per micro-batch — the Spark
  *                          analog of the reference's WaitAndBatch drain
  *                          ceiling (`WaitAndBatch.java:32-33`: sleep T,
  *                          then read at most N)
  * @param processingTime    trigger interval; None = Trigger.AvailableNow
  *                          (drain the feed, then stop — used for replay
  *                          verification and benchmarks)
  */
final case class StreamConfig(
    feedDir: String,
    tableDir: String,
    checkpointDir: String,
    checkpointId: String = "cdc",
    maxFilesPerTrigger: Int = 4,
    processingTime: Option[String] = None,
    merge: MergeConfig = MergeConfig())

/** Structured Streaming driver: tail the change feed, apply each
  * micro-batch through the MERGE kernel, commit exactly-once.
  *
  * The reference pipeline's shape (`GetFile` source -> `WaitAndBatch`
  * micro-batching -> `PontusTinkerPopClientRecordBulk` one-upsert-per-batch,
  * `PontusTinkerPopClientRecordBulk.java:91-126`) maps 1:1 onto
  * `readStream -> trigger/admission -> foreachBatch(merge)`; the
  * at-least-once session commit/rollback (`PontusIdGenerator.java:361-378`)
  * is upgraded to exactly-once by the table's (checkpointId, batchId)
  * ledger: a batch replayed after a crash between table commit and
  * checkpoint write is recognized and skipped.
  */
object CdcStream {

  /** Schema of the feed dir (batch-inferred once at start; a CDC schema
    * change is a restart point — the new run re-infers and the MERGE
    * kernel evolves the table).
    */
  def feedSchema(spark: SparkSession, feedDir: String): StructType =
    spark.read.parquet(feedDir).schema

  /** Start tailing. `onBatch` is a test/metrics hook invoked after each
    * merge with (batchId, result).
    */
  def start(
      spark: SparkSession,
      cfg: StreamConfig,
      onBatch: (Long, graft.merge.MergeResult) => Unit = (_, _) => ()): StreamingQuery = {
    val schema = feedSchema(spark, cfg.feedDir)
    val feed = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
      .parquet(cfg.feedDir)

    val table = LakeTable(cfg.tableDir)
    val writer = feed.writeStream
      .queryName(s"cdc-${cfg.checkpointId}")
      .option("checkpointLocation", cfg.checkpointDir)
      .trigger(cfg.processingTime
        .map(t => Trigger.ProcessingTime(t): Trigger)
        .getOrElse(Trigger.AvailableNow()))
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        // `seg`/`phase` are feed bookkeeping (partition dirs), not payload
        val batch = df.drop("seg", "phase")
        val res = MergeInto.apply(df.sparkSession, table, batch,
          cfg.checkpointId, batchId, cfg.merge)
        onBatch(batchId, res)
      }
    writer.start()
  }

  /** Drain the whole feed synchronously (AvailableNow + await). Returns the
    * final table state.
    */
  def runToCompletion(spark: SparkSession, cfg: StreamConfig,
      onBatch: (Long, graft.merge.MergeResult) => Unit = (_, _) => ()): DataFrame = {
    val q = start(spark, cfg.copy(processingTime = None), onBatch)
    q.awaitTermination()
    LakeTable(cfg.tableDir).read(spark)
  }
}
