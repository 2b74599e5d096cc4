package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Labeled-edge emission — the reference writes vertices AND labeled
  * edges per updatereq rule (`flow.xml:1298-1307`:
  * `{label, fromVertexLabel, toVertexLabel}`). The Spark-native form is a
  * second normalized table keyed by (edge_label, from_id, to_id): edges
  * aggregate by key (map-side combine collapses repeat observations
  * before the exchange) and can flow through the same MERGE kernel as
  * vertices with `doc_id = edge key`.
  */
object Edges {

  /** Distinct labeled edges with observation counts and the LSN range
    * they were seen over (lineage for incremental edge upserts).
    */
  def emit(df: DataFrame, label: String, from: Column, to: Column,
      lsn: Option[Column] = None): DataFrame = {
    val base = df.select(lit(label).as("edge_label"),
      from.as("from_id"), to.as("to_id"),
      lsn.getOrElse(lit(0L)).as("_lsn"))
    base.groupBy("edge_label", "from_id", "to_id")
      .agg(count(lit(1)).as("n_obs"),
        min("_lsn").as("min_lsn"), max("_lsn").as("max_lsn"))
  }

  /** Stable edge key for MERGE into an edges LakeTable (doc_id shape). */
  def edgeKey: Column =
    concat_ws("|", col("edge_label"), col("from_id"), col("to_id"))

  /** [[emit]] output reshaped as MERGE-able change events: `doc_id` = the
    * edge key, `lsn` = the BATCH SEQUENCE NUMBER, op = UPSERT. Drive
    * through [[graft.merge.MergeInto]] with [[mergePolicies]] and
    * [[tableSchema]] to accumulate edges incrementally across
    * micro-batches — the reference upserts edges per record into the
    * graph (`flow.xml:1298-1307`); here each batch folds its per-edge
    * counts and LSN ranges into the edges LakeTable.
    *
    * The merge version MUST be the batch number, not a data LSN: the
    * kernel drops changes older than the stored row (`c.lsn >= t.lsn`),
    * and a later batch's max data-LSN for an edge can be BELOW an earlier
    * batch's (interleaved feeds), which would silently drop that batch's
    * fold. Batch numbers are monotone by construction; replay protection
    * is the ledger's job, not the LWW gate's.
    */
  def asChanges(edges: DataFrame, batchSeq: Long): DataFrame =
    edges.select(
      edgeKey.as("doc_id"),
      lit(batchSeq).as("lsn"),
      lit(graft.model.Ops.Upsert).as("op"),
      col("edge_label"), col("from_id"), col("to_id"),
      col("n_obs"), col("min_lsn"), col("max_lsn"))

  /** Accumulating merge policies for the edge metric columns. */
  val mergePolicies: Map[String, graft.merge.ColumnPolicy] = Map(
    "n_obs" -> graft.merge.ColumnPolicy.AddExisting,
    "min_lsn" -> graft.merge.ColumnPolicy.MinExisting,
    "max_lsn" -> graft.merge.ColumnPolicy.MaxExisting)

  /** Logical schema of an edges LakeTable (pass as
    * `MergeConfig.initialSchema`).
    */
  val tableSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id STRING, edge_label STRING, from_id STRING, to_id STRING, " +
        "n_obs BIGINT, min_lsn BIGINT, max_lsn BIGINT, lsn BIGINT")
}
