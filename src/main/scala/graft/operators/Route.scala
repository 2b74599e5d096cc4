package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Predicate routing and keyed match-status operators — the Spark-first
  * form of the reference's `QueryRecord` SQL routing (production flow
  * `flow.xml:6432-6475`: one named SQL per output relationship),
  * `RouteOnAttribute`, and the `PontusIdGenerator` match-or-create
  * decision (`PontusIdGenerator.java:308-329`).
  */
object Route {

  /** Multi-way routing: each named predicate becomes one output frame over
    * the same (cached-by-caller) batch — N filters Catalyst can push into
    * one scan, not N passes of a row loop.
    */
  def byPredicates(df: DataFrame, routes: Map[String, Column]): Map[String, DataFrame] =
    routes.map { case (name, pred) => name -> df.filter(pred) }

  /** Rows matching none of the routes (the reference's `unmatched`
    * relationship).
    */
  def unmatched(df: DataFrame, routes: Map[String, Column]): DataFrame =
    if (routes.isEmpty) df
    else df.filter(!routes.values.reduce(_ || _))

  /** Single-pass route tagging: adds a `route` column with the FIRST
    * matching route name in `routes` order (deterministic priority), or
    * 'unmatched'. Preferred at scale when downstream wants one shuffle
    * instead of N scans.
    */
  def tagged(df: DataFrame, routes: Seq[(String, Column)]): DataFrame = {
    val tag = routes.foldRight(lit("unmatched")) { case ((name, pred), els) =>
      when(pred, lit(name)).otherwise(els)
    }
    df.withColumn("route", tag)
  }

  /** Match-or-create status against a keyed target: for each incoming
    * record, how many target rows match its key — 0 -> NO_MATCH (would
    * insert a new id), 1 -> MATCH (reuse), >1 -> MULTIPLE (ambiguous,
    * new id). Exactly the reference decision table
    * (`PontusIdGenerator.java:308-329`), as one broadcast-able aggregate
    * join instead of a per-record store scan.
    */
  def matchStatus(incoming: DataFrame, target: DataFrame, key: String): DataFrame = {
    val counts = target.groupBy(col(key)).agg(count(lit(1)).as("n_matches"))
    incoming.join(counts, Seq(key), "left")
      .withColumn("n_matches", coalesce(col("n_matches"), lit(0L)))
      .withColumn("match_status",
        when(col("n_matches") === 1, lit("MATCH"))
          .when(col("n_matches") === 0, lit("NO_MATCH"))
          .otherwise(lit("MULTIPLE")))
  }
}
