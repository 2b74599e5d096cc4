package graft

import graft.functions.Fns
import graft.merge.{MergeConfig, MergeInto}
import graft.operators.{Ann, Dedup, Multimodal, Route}
import graft.table.LakeTable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract: one entry per implemented operator (SURVEY.md §2 and
  * the training-data-pipeline surface), each with a DuckDB oracle where the
  * semantics are ANSI-SQL-expressible. Column names/aliases are kept
  * identical between the Spark plan and the oracle SQL (the driver's
  * compare sorts columns by name and hashes values).
  */
object SparkEntry {

  private def t(dir: String, name: String) = s"$dir/$name.parquet"

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("cdc_final_state")(spark, "/root/testdata/sf0.001")

  // ---- the events table viewed as a CDC change feed --------------------
  // lsn = event_id (monotonic), key = user, op: 'error' events are deletes,
  // everything else upserts; tokens are a deterministic 3-int payload.
  private def cdcChanges(spark: SparkSession, dir: String): DataFrame = {
    val ev = spark.read.parquet(t(dir, "events"))
    ev.select(
      ev("event_id").as("lsn"),
      concat(lit("u"), ev("user_id").cast("string")).as("doc_id"),
      when(ev("event_type") === "error", lit("D")).otherwise(lit("U")).as("op"),
      when(ev("event_type") === "error", lit(null)).otherwise(array(
        get_json_object(ev("props"), "$.k").cast("int"),
        floor(ev("value") * 100).cast("int"),
        (ev("event_id") % 1000).cast("int"))).as("tokens"),
      when(ev("event_type") === "error", lit(null)).otherwise(lit(3)).cast("int").as("n_tok"),
      ev("event_type").as("source"))
  }

  private val cdcChangesSql =
    """SELECT event_id AS lsn,
      |       'u' || CAST(user_id AS VARCHAR) AS doc_id,
      |       CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
      |       CASE WHEN event_type = 'error' THEN NULL
      |            ELSE [CAST(json_extract_string(props, '$.k') AS INTEGER),
      |                  CAST(floor(value * 100) AS INTEGER),
      |                  CAST(event_id % 1000 AS INTEGER)] END AS tokens,
      |       CASE WHEN event_type = 'error' THEN NULL ELSE 3 END AS n_tok,
      |       event_type AS source
      |FROM events""".stripMargin

  /** Normalized word list (identical Spark/DuckDB expression pair). */
  private def wordsSqlOf(textExpr: String) =
    s"string_split(trim(regexp_replace(lower($textExpr), '\\s+', ' ', 'g')), ' ')"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ================= CDC / MERGE engine =================

    // Full engine end-to-end: events-as-changes replayed in 4 interleaved
    // micro-batches (lsn % 4 — deliberately maximal cross-batch disorder)
    // through MergeInto into a fresh LakeTable; final surviving state.
    "cdc_final_state" -> ((s, dir) => {
      val root = java.nio.file.Files.createTempDirectory("graft-cdc-q").toString
      val table = LakeTable(root)
      val changes = cdcChanges(s, dir).persist()
      try {
        (0L until 4L).foreach { b =>
          MergeInto.apply(s, table, changes.filter(col("lsn") % 4 === b),
            "verify", b, MergeConfig(numBuckets = 8, saltFactor = 8))
        }
        table.read(s).select("doc_id", "tokens", "n_tok", "source", "lsn")
          .orderBy("doc_id")
      } finally changes.unpersist()
    }),

    // The dedupe-by-(doc_id, lsn) window operator on its own (north-rule
    // shape: row_number over lsn desc), salted two-stage path exercised.
    "cdc_dedupe_lww" -> ((s, dir) => {
      MergeInto.dedupeLatest(cdcChanges(s, dir), saltFactor = 8)
        .select("doc_id", "lsn", "op", "source")
        .orderBy("doc_id")
    }),

    // Per-partition feed statistics (lineage shape) over the change feed.
    "cdc_lineage_stats" -> ((s, dir) => {
      cdcChanges(s, dir)
        .groupBy((col("lsn") % 8).cast("int").as("part"))
        .agg(count(lit(1)).as("n_events"),
          min("lsn").as("min_lsn"), max("lsn").as("max_lsn"),
          sum(when(col("op") === "D", 1L).otherwise(0L)).as("n_delete"),
          countDistinct("doc_id").as("n_keys"))
        .orderBy("part")
    }),

    // Match-or-create decision table (PontusIdGenerator semantics): state
    // after the first half of the feed, probed with the second half's keys.
    "cdc_match_status" -> ((s, dir) => {
      val ch = cdcChanges(s, dir)
      val half = 5000L
      val w = Window.partitionBy(col("doc_id")).orderBy(col("lsn").desc)
      val target = ch.filter(col("lsn") < half)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .filter(col("op") =!= "D")
      val incoming = ch.filter(col("lsn") >= half).select("doc_id").distinct()
      Route.matchStatus(incoming, target, "doc_id")
        .select("doc_id", "n_matches", "match_status")
        .orderBy("doc_id")
    }),

    // ================= routing (QueryRecord / RouteOnAttribute) =========

    "route_filter" -> ((s, dir) => {
      val ev = s.read.parquet(t(dir, "events"))
      ev.filter(ev("event_type") === "purchase" && ev("value") > 50)
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
    }),

    // QueryRecord in its literal form: a SQL text per output relationship
    // over the current batch (reference flow.xml:6432-6475); also covers
    // the query-from-input processor (PontusTinkerPopClientQueryFromFlowFile)
    "route_sql_query" -> ((s, dir) => {
      s.read.parquet(t(dir, "events")).createOrReplaceTempView("FLOWFILE")
      s.sql("""SELECT event_id, user_id, event_type FROM FLOWFILE
              |WHERE event_type = 'signup' AND user_id % 2 = 0
              |ORDER BY event_id""".stripMargin)
    }),

    // UDTF-shaped explode (reference PST/archive explode: 1 blob -> N
    // records): one document -> its distinct word 3-shingles
    "explode_shingles" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents")).filter(col("doc_id") < 20)
      d.select(d("doc_id"), explode(Fns.shingles(d("text"), 3)).as("shingle"))
        .orderBy("doc_id", "shingle")
    }),

    "route_tagged_counts" -> ((s, dir) => {
      val ev = s.read.parquet(t(dir, "events"))
      Route.tagged(ev, Seq(
        "purchase_hi" -> (ev("event_type") === "purchase" && ev("value") >= 100),
        "error" -> (ev("event_type") === "error"),
        "signup" -> (ev("event_type") === "signup")))
        .groupBy("route").agg(count(lit(1)).as("n"))
        .orderBy("route")
    }),

    // ================= scalar transforms =================

    "json_path_extract" -> ((s, dir) => {
      val ev = s.read.parquet(t(dir, "events"))
      ev.select(ev("event_id"),
        get_json_object(ev("props"), "$.k").cast("int").as("k"))
        .orderBy("event_id")
    }),

    "template_expand" -> ((s, dir) => {
      val ev = s.read.parquet(t(dir, "events"))
      ev.select(ev("event_id"),
        Fns.templateExpand("user ~~{u}~~ event ~~{e}~~",
          Map("u" -> ev("user_id"), "e" -> ev("event_type"))).as("msg"))
        .orderBy("event_id")
    }),

    "record_to_json" -> ((s, dir) => {
      val n = s.read.parquet(t(dir, "nation"))
      val proj = n.select("n_name", "n_regionkey")
      n.select(n("n_nationkey"), Fns.recordToJson(proj).as("j"))
        .orderBy("n_nationkey")
    }),

    "regex_entity_extract" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents"))
      d.select(d("doc_id"),
        regexp_extract_all(d("text"), lit("\\b(spark|join|merge|filter)\\b"), lit(1))
          .as("entities"))
        .withColumn("n_entities", size(col("entities")))
        .orderBy("doc_id")
    }),

    "regex_replace_norm" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents"))
      d.select(d("doc_id"),
        substring(regexp_replace(lower(d("text")), "[aeiou]", "_"), 1, 40).as("norm"))
        .orderBy("doc_id")
    }),

    "hash_sha256" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents"))
      d.select(d("doc_id"), sha2(d("text"), 256).as("h")).orderBy("doc_id")
    }),

    "fingerprint_md5" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents"))
      d.select(d("doc_id"), Fns.docFingerprint(d("text")).as("fp")).orderBy("doc_id")
    }),

    "base64_content" -> ((s, dir) => {
      val n = s.read.parquet(t(dir, "nation"))
      n.select(n("n_nationkey"), base64(n("n_name").cast("binary")).as("b64"))
        .orderBy("n_nationkey")
    }),

    // keyed HMAC tokenization — no SQL oracle (keyed crypto); rows-only
    "hmac_tokenize" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents"))
      d.select(d("doc_id"), Fns.hmacSha256("graft-demo-key")(d("text")).as("token"))
        .orderBy("doc_id")
    }),

    // ================= text analysis =================

    "text_token_count" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents"))
      d.select(d("doc_id"), Fns.tokenCount(d("text")).as("n_words"),
        d("n_chars")).orderBy("doc_id")
    }),

    "text_quality" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents"))
      val f = Fns.qualityFeatures(d("text"))
      d.select((d("doc_id") +: f.map { case (n, c) => c.as(n) }) :+
        Fns.qualityScore(d("text")).as("quality"): _*)
        .orderBy("doc_id")
    }),

    "text_lang_id" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents"))
      d.select(d("doc_id"), Fns.langId(d("text")).as("lang_pred")).orderBy("doc_id")
    }),

    // ================= dedup =================

    "dedup_exact" -> ((s, dir) => {
      Dedup.exact(s.read.parquet(t(dir, "documents")))
        .select("fp", "keep_id", "n_members", "n_dups")
        .orderBy("fp")
    }),

    "dedup_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccard(s.read.parquet(t(dir, "documents")), threshold = 0.2)
        .orderBy("id_a", "id_b")
    }),

    "dedup_clusters" -> ((s, dir) => {
      val pairs = Dedup.ngramJaccard(s.read.parquet(t(dir, "documents")), threshold = 0.2)
      Dedup.clusters(pairs, maxIter = 8).orderBy("id")
    }),

    // sketch-based dedup — engine-specific hashes; rows-only checks
    "dedup_minhash_lsh" -> ((s, dir) => {
      Dedup.minhashLsh(s.read.parquet(t(dir, "documents")), k = 16, bands = 4)
        .orderBy("id_a", "id_b")
    }),

    "dedup_simhash" -> ((s, dir) => {
      Dedup.simhashPairs(s.read.parquet(t(dir, "documents")), maxHamming = 8)
        .orderBy("id_a", "id_b")
    }),

    "dedup_embedding" -> ((s, dir) => {
      Dedup.embeddingCosine(s.read.parquet(t(dir, "embeddings")),
        threshold = 0.5, planes = 8)
        .orderBy("id_a", "id_b")
    }),

    // ================= similarity search =================

    "ann_bruteforce_topk" -> ((s, dir) => {
      val e = s.read.parquet(t(dir, "embeddings"))
      Ann.bruteForceTopK(e, e.filter(col("vec_id") < 5), k = 5)
        .select("query_id", "nbr_id", "sim", "rank")
        .orderBy("query_id", "rank")
    }),

    "ann_lsh_topk" -> ((s, dir) => {
      val e = s.read.parquet(t(dir, "embeddings"))
      Ann.lshTopK(e, e.filter(col("vec_id") < 5), k = 5, planes = 6, probes = 2)
        .select("query_id", "nbr_id", "sim", "rank")
        .orderBy("query_id", "rank")
    }),

    // ================= multimodal plumbing =================

    "multimodal_features" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents"))
      val payloads = d.select(d("doc_id"), d("text").cast("binary").as("payload"))
      Multimodal.extractFeatures(payloads).toDF()
        .select("doc_id", "n_bytes", "format")
        .orderBy("doc_id")
    }),

    // ================= joins / aggregation / windows =================

    "join_revenue_by_nation" -> ((s, dir) => {
      val li = s.read.parquet(t(dir, "lineitem"))
      val o = s.read.parquet(t(dir, "orders"))
      val c = s.read.parquet(t(dir, "customer"))
      val n = s.read.parquet(t(dir, "nation"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(n("n_name"))
        .agg(
          sum((li("l_extendedprice").cast("decimal(18,4)") *
            (lit(1).cast("decimal(18,4)") - li("l_discount").cast("decimal(18,4)")))
            .cast("decimal(28,8)")).as("revenue"),
          count(lit(1)).as("n_items"))
        // products of 2dp x 2dp are exact at 4dp: scale-4 cast loses nothing
        .withColumn("revenue", col("revenue").cast("decimal(28,4)"))
        .orderBy("n_name")
    }),

    "window_topk_per_user" -> ((s, dir) => {
      val ev = s.read.parquet(t(dir, "events"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("value").desc, col("event_id").asc)
      ev.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select("user_id", "event_id", "value", "rnk")
        .orderBy("user_id", "rnk")
    }),

    "agg_events_daily" -> ((s, dir) => {
      val ev = s.read.parquet(t(dir, "events"))
      ev.groupBy(date_trunc("day", ev("ts")).as("day"), ev("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(ev("value").cast("decimal(18,2)")).as("total_value"))
        .orderBy("day", "event_type")
    }),

    "agg_rollup_docs" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents"))
      d.rollup(d("lang"), d("source"))
        .agg(count(lit(1)).as("n"), sum(d("n_chars")).as("chars"))
        .orderBy(col("lang").asc_nulls_first, col("source").asc_nulls_first)
    }),

    "set_except_docs" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents"))
      d.filter(d("lang") === "en").select("doc_id")
        .except(d.filter(d("source") === "src0").select("doc_id"))
        .orderBy("doc_id")
    }),

    "window_sessionize" -> ((s, dir) => {
      val ev = s.read.parquet(t(dir, "events"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      // ts is TIMESTAMP_NTZ in the driver parquet: go via timestamp to epoch
      val epoch: Column => Column = c => c.cast("timestamp").cast("long")
      val gapped = ev.withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            epoch(col("ts")) - epoch(col("prev_ts")) > 1800, 1L)
            .otherwise(0L))
      gapped.withColumn("session_id",
          sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id")
        .agg(max("session_id").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    })
  )

  /** DuckDB-runnable oracles. Omitted for engine-specific-hash operators
    * (minhash/simhash/LSH/HMAC) -> driver records rows-only checks; those
    * operators are instead oracle-checked in ScalaTest against exact
    * implementations.
    */
  def oracleSql: Map[String, String] = Map(

    "cdc_final_state" ->
      s"""WITH changes AS ($cdcChangesSql),
         |latest AS (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY lsn DESC) AS rn
         |  FROM changes)
         |SELECT doc_id, tokens, n_tok, source, lsn
         |FROM latest WHERE rn = 1 AND op <> 'D'
         |ORDER BY doc_id""".stripMargin,

    "cdc_dedupe_lww" ->
      s"""WITH changes AS ($cdcChangesSql),
         |latest AS (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY lsn DESC) AS rn
         |  FROM changes)
         |SELECT doc_id, lsn, op, source FROM latest WHERE rn = 1
         |ORDER BY doc_id""".stripMargin,

    "cdc_lineage_stats" ->
      s"""WITH changes AS ($cdcChangesSql)
         |SELECT CAST(lsn % 8 AS INTEGER) AS part, count(*) AS n_events,
         |       min(lsn) AS min_lsn, max(lsn) AS max_lsn,
         |       CAST(sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT) AS n_delete,
         |       count(DISTINCT doc_id) AS n_keys
         |FROM changes GROUP BY 1 ORDER BY part""".stripMargin,

    "cdc_match_status" ->
      s"""WITH changes AS ($cdcChangesSql),
         |target AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY lsn DESC) AS rn
         |    FROM changes WHERE lsn < 5000) ranked
         |  WHERE rn = 1 AND op <> 'D'),
         |incoming AS (SELECT DISTINCT doc_id FROM changes WHERE lsn >= 5000),
         |counted AS (
         |  SELECT i.doc_id, count(t.doc_id) AS n_matches
         |  FROM incoming i LEFT JOIN target t ON i.doc_id = t.doc_id
         |  GROUP BY i.doc_id)
         |SELECT doc_id, n_matches,
         |       CASE WHEN n_matches = 1 THEN 'MATCH'
         |            WHEN n_matches = 0 THEN 'NO_MATCH'
         |            ELSE 'MULTIPLE' END AS match_status
         |FROM counted ORDER BY doc_id""".stripMargin,

    "route_filter" ->
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'purchase' AND value > 50
        |ORDER BY event_id""".stripMargin,

    "route_sql_query" ->
      """SELECT event_id, user_id, event_type FROM events
        |WHERE event_type = 'signup' AND user_id % 2 = 0
        |ORDER BY event_id""".stripMargin,

    "explode_shingles" -> {
      val ws = wordsSqlOf("text")
      s"""WITH w AS (SELECT doc_id, $ws AS ws FROM documents WHERE doc_id < 20),
         |sh AS (SELECT doc_id,
         |         list_distinct([array_to_string(ws[i:i+2], ' ')
         |                        for i in range(1, len(ws) - 1)]) AS shs
         |       FROM w WHERE len(ws) >= 3)
         |SELECT doc_id, unnest(shs) AS shingle FROM sh
         |ORDER BY doc_id, shingle""".stripMargin
    },

    "route_tagged_counts" ->
      """SELECT CASE
        |  WHEN event_type = 'purchase' AND value >= 100 THEN 'purchase_hi'
        |  WHEN event_type = 'error' THEN 'error'
        |  WHEN event_type = 'signup' THEN 'signup'
        |  ELSE 'unmatched' END AS route, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY route""".stripMargin,

    "json_path_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "template_expand" ->
      """SELECT event_id,
        |  'user ' || CAST(user_id AS VARCHAR) || ' event ' || event_type AS msg
        |FROM events ORDER BY event_id""".stripMargin,

    "record_to_json" ->
      """SELECT n_nationkey,
        |  '{"n_name":"' || n_name || '","n_regionkey":' || CAST(n_regionkey AS VARCHAR) || '}' AS j
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "regex_entity_extract" ->
      """SELECT doc_id,
        |  regexp_extract_all(text, '\b(spark|join|merge|filter)\b', 1) AS entities,
        |  CAST(len(regexp_extract_all(text, '\b(spark|join|merge|filter)\b', 1)) AS INTEGER) AS n_entities
        |FROM documents ORDER BY doc_id""".stripMargin,

    "regex_replace_norm" ->
      """SELECT doc_id,
        |  substr(regexp_replace(lower(text), '[aeiou]', '_', 'g'), 1, 40) AS norm
        |FROM documents ORDER BY doc_id""".stripMargin,

    "hash_sha256" ->
      "SELECT doc_id, sha256(text) AS h FROM documents ORDER BY doc_id",

    "fingerprint_md5" ->
      """SELECT doc_id,
        |  substr(md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))), 1, 16) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "base64_content" ->
      """SELECT n_nationkey, to_base64(encode(n_name)) AS b64
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "text_token_count" ->
      s"""SELECT doc_id,
         |  CAST(CASE WHEN trim(text) = '' THEN 0
         |            ELSE len(${wordsSqlOf("text")}) END AS INTEGER) AS n_words,
         |  n_chars
         |FROM documents ORDER BY doc_id""".stripMargin,

    "text_lang_id" -> {
      def hits(sw: Seq[String]) =
        s"len(list_filter(${wordsSqlOf("text")}, w -> w IN (${sw.map(s => s"'$s'").mkString(",")})))"
      val en = hits(Fns.langStopwords("en"))
      val de = hits(Fns.langStopwords("de"))
      val es = hits(Fns.langStopwords("es"))
      val fr = hits(Fns.langStopwords("fr"))
      s"""SELECT doc_id, CASE
         |  WHEN $en = 0 AND $de = 0 AND $es = 0 AND $fr = 0 THEN 'unknown'
         |  WHEN $en >= $de AND $en >= $es AND $en >= $fr THEN 'en'
         |  WHEN $de >= $es AND $de >= $fr THEN 'de'
         |  WHEN $es >= $fr THEN 'es'
         |  ELSE 'fr' END AS lang_pred
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "dedup_exact" ->
      """WITH g AS (
        |  SELECT substr(md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))), 1, 16) AS fp,
        |         min(doc_id) AS keep_id, count(*) AS n_members
        |  FROM documents GROUP BY 1)
        |SELECT fp, keep_id, n_members, n_members - 1 AS n_dups
        |FROM g ORDER BY fp""".stripMargin,

    "dedup_ngram_jaccard" -> {
      val ws = wordsSqlOf("text")
      s"""WITH w AS (SELECT doc_id, $ws AS ws FROM documents),
         |sh AS (SELECT doc_id,
         |         list_distinct([array_to_string(ws[i:i+2], ' ')
         |                        for i in range(1, len(ws) - 1)]) AS shs
         |       FROM w WHERE len(ws) >= 3),
         |e AS (SELECT doc_id, len(shs) AS n_sh, unnest(shs) AS s FROM sh)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |       round(count(*)::DOUBLE / (a.n_sh + b.n_sh - count(*)), 4) AS jaccard
         |FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
         |GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
         |HAVING round(count(*)::DOUBLE / (a.n_sh + b.n_sh - count(*)), 4) >= 0.2
         |ORDER BY id_a, id_b""".stripMargin
    },

    "dedup_clusters" -> {
      val ws = wordsSqlOf("text")
      s"""WITH RECURSIVE w AS (SELECT doc_id, $ws AS ws FROM documents),
         |sh AS (SELECT doc_id,
         |         list_distinct([array_to_string(ws[i:i+2], ' ')
         |                        for i in range(1, len(ws) - 1)]) AS shs
         |       FROM w WHERE len(ws) >= 3),
         |e AS (SELECT doc_id, len(shs) AS n_sh, unnest(shs) AS s FROM sh),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
         |  HAVING round(count(*)::DOUBLE / (a.n_sh + b.n_sh - count(*)), 4) >= 0.2),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |          UNION ALL SELECT id_b, id_a FROM pairs),
         |cc(id, label) AS (
         |  SELECT DISTINCT src, src FROM edges
         |  UNION
         |  SELECT e.src, cc.label FROM edges e JOIN cc ON e.dst = cc.id)
         |SELECT id, min(label) AS cluster_id FROM cc GROUP BY id ORDER BY id""".stripMargin
    },

    "ann_bruteforce_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS nbr_id, embedding AS cv FROM embeddings),
        |p AS (
        |  SELECT query_id, nbr_id,
        |    list_sum(list_transform(range(1, len(qv) + 1),
        |      i -> qv[i]::DOUBLE * cv[i]::DOUBLE)) AS dot,
        |    sqrt(list_sum(list_transform(range(1, len(qv) + 1),
        |      i -> qv[i]::DOUBLE * qv[i]::DOUBLE))) AS qn,
        |    sqrt(list_sum(list_transform(range(1, len(cv) + 1),
        |      i -> cv[i]::DOUBLE * cv[i]::DOUBLE))) AS cn
        |  FROM q CROSS JOIN c WHERE query_id <> nbr_id),
        |ranked AS (
        |  SELECT query_id, nbr_id, dot / (qn * cn) AS sim,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY dot / (qn * cn) DESC, nbr_id ASC) AS rank
        |  FROM p)
        |SELECT query_id, nbr_id, round(sim, 4) AS sim, CAST(rank AS INTEGER) AS rank
        |FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "multimodal_features" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  CASE CAST(octet_length(encode(text)) % 3 AS INTEGER)
        |    WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format
        |FROM documents ORDER BY doc_id""".stripMargin,

    "join_revenue_by_nation" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |           (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
        |       AS DECIMAL(28,4)) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "window_topk_per_user" ->
      """SELECT user_id, event_id, value, CAST(rnk AS INTEGER) AS rnk FROM (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY value DESC, event_id ASC) AS rnk
        |  FROM events)
        |WHERE rnk <= 3 ORDER BY user_id, rnk""".stripMargin,

    "agg_events_daily" ->
      """SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,

    "agg_rollup_docs" ->
      """SELECT lang, source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents GROUP BY ROLLUP (lang, source)
        |ORDER BY lang ASC NULLS FIRST, source ASC NULLS FIRST""".stripMargin,

    "set_except_docs" ->
      """SELECT doc_id FROM documents WHERE lang = 'en'
        |EXCEPT
        |SELECT doc_id FROM documents WHERE source = 'src0'
        |ORDER BY doc_id""".stripMargin,

    "window_sessionize" ->
      """WITH gapped AS (
        |  SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN prev_ts IS NULL
        |           OR CAST(floor(epoch(ts)) AS BIGINT)
        |              - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM gapped),
        |sess AS (
        |  SELECT user_id,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged)
        |SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM sess GROUP BY user_id ORDER BY user_id""".stripMargin,

    "text_quality" -> {
      val ws = wordsSqlOf("text")
      val alpha = "length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE"
      val punct = "length(regexp_replace(text, '[^[:punct:]]', '', 'g'))::DOUBLE"
      val nw = s"(CASE WHEN trim(text) = '' THEN 0 ELSE len($ws) END)"
      val sw = Fns.langStopwords("en").map(s => s"'$s'").mkString(",")
      val swHits = s"len(list_filter($ws, w -> w IN ($sw)))::DOUBLE"
      def t4(x: String) = s"floor(($x) * 10000) / 10000"
      val alphaRatio = t4(s"$alpha / greatest(length(text)::DOUBLE, 1.0)")
      val swRatio = t4(s"$swHits / greatest($nw::DOUBLE, 1.0)")
      s"""SELECT doc_id,
         |  CAST(length(text) AS INTEGER) AS n_chars,
         |  CAST($nw AS INTEGER) AS n_words,
         |  $alphaRatio AS alpha_ratio,
         |  ${t4(s"$punct / greatest(length(text)::DOUBLE, 1.0)")} AS punct_ratio,
         |  ${t4(s"$alpha / greatest($nw::DOUBLE, 1.0)")} AS mean_word_len,
         |  $swRatio AS stopword_ratio,
         |  ${t4(s"least(1.0, ($alphaRatio) * 0.5 + least($nw::DOUBLE / 100.0, 1.0) * 0.3 + least(($swRatio) * 5.0, 1.0) * 0.2)")}
         |    AS quality
         |FROM documents ORDER BY doc_id""".stripMargin
    }
  )
}
