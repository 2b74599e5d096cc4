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
    * relationship). Each predicate is coalesced to false so a NULL-valued
    * predicate counts as "did not match" — every row lands on exactly one
    * relationship, like the reference's RouteOnAttribute, instead of
    * disappearing into three-valued logic.
    */
  def unmatched(df: DataFrame, routes: Map[String, Column]): DataFrame =
    if (routes.isEmpty) df
    else df.filter(!routes.values.map(p => coalesce(p, lit(false))).reduce(_ || _))

  /** Single-pass route tagging: adds a `route` column with the FIRST
    * matching route name in `routes` order (deterministic priority), or
    * 'unmatched' (NULL predicates tag as unmatched, not dropped).
    * Preferred at scale when downstream wants one shuffle instead of N
    * scans.
    */
  def tagged(df: DataFrame, routes: Seq[(String, Column)]): DataFrame = {
    val tag = routes.foldRight(lit("unmatched")) { case ((name, pred), els) =>
      when(coalesce(pred, lit(false)), lit(name)).otherwise(els)
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

  /** Fuzzy match-or-create: the reference's `textContainsFuzzy` upsert
    * predicate (`flow.xml:1175`, `mandatoryInSearch` rules) — candidates
    * are BLOCKED by an exact key first (the rule doc's mandatory exact
    * search props), then matched by edit distance within the block. Never
    * all-pairs: the join is an equi-join on the block key, with the
    * levenshtein predicate applied inside each block (Spark's
    * threshold-bounded levenshtein abandons early above `maxDist`).
    *
    * Returns one row per incoming row with `n_matches` and the
    * PontusIdGenerator decision (`MATCH` / `NO_MATCH` / `MULTIPLE`,
    * `PontusIdGenerator.java:308-329`).
    */
  def matchStatusFuzzy(incoming: DataFrame, target: DataFrame,
      blockKey: String, incomingKey: String, targetKey: String,
      maxDist: Int): DataFrame = {
    val inc = incoming.select(col(blockKey).as("_block"), col(incomingKey))
    val tgt = target.select(col(blockKey).as("_block"), col(targetKey))
    val joined = inc.join(tgt,
      inc("_block") === tgt("_block") &&
        levenshtein(col(incomingKey), col(targetKey), maxDist).between(0, maxDist),
      "left")
    joined
      .groupBy(col(incomingKey), inc("_block").as(blockKey))
      .agg(count(col(targetKey)).as("n_matches"))
      .withColumn("match_status",
        when(col("n_matches") === 1, lit("MATCH"))
          .when(col("n_matches") === 0, lit("NO_MATCH"))
          .otherwise(lit("MULTIPLE")))
  }
}
