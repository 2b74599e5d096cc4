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
}
