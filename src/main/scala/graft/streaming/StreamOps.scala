package graft.streaming

import graft.model.ChangeEvent
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics operators beyond the CDC tail: event-time windowed
  * aggregation with watermarks, and keyed last-writer-wins state kept in
  * the Spark state store (`flatMapGroupsWithState`) — the streaming
  * counterpart of the batch dedupe window for pipelines that want the
  * current winner per key continuously rather than per-snapshot.
  */
object StreamOps {

  /** Tumbling event-time windowed counts/sums with a watermark: the
    * streaming form of the reference's `QueryRecord`-then-aggregate flows.
    * `events` must be a streaming frame with an event-time column.
    */
  def windowedCounts(events: DataFrame, tsCol: String, valueCol: String,
      windowLen: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("total_value"))

  /** Continuously-updated last-writer-wins state per doc_id: each
    * micro-batch emits the keys whose winning event changed. State =
    * highest-LSN event seen; deletes remain in state as fences (the
    * streaming analog of the table tombstone) and emit op=D rows so sinks
    * can remove.
    */
  def lwwState(events: Dataset[ChangeEvent]): Dataset[ChangeEvent] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState[ChangeEvent, ChangeEvent](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: String, batch: Iterator[ChangeEvent], state: GroupState[ChangeEvent]) =>
          val incoming = batch.reduceOption((a, b) => if (a.lsn >= b.lsn) a else b)
          incoming match {
            case Some(win) if !state.exists || win.lsn >= state.get.lsn =>
              state.update(win)
              Iterator.single(win)
            case _ => Iterator.empty
          }
      }
  }
}
