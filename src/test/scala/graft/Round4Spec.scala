package graft

import graft.changegen.{ChangeGen, FeedConfig, Phase, RawEvent}
import graft.merge.{MergeConfig, MergeInto}
import graft.model.Ops
import graft.operators.Edges
import graft.rules.UpdateReq
import graft.table.LakeTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-4 contract tightening on the rules layer: templates must bind
  * ALL their parts, post-processor chains must account for every step.
  */
class RulesContractSpec extends SparkSpec {
  import spark.implicits._

  private def propOf(value: String, pp: Option[String] = None): UpdateReq.PropRule =
    UpdateReq.PropRule("p", value, "eq", None, mandatoryInSearch = false,
      excludeFromSearch = false, excludeFromUpdate = false, postProcessor = pp)

  test("mixed text+token templates bind every part (no silent single pick)") {
    val df = Seq(("d1", "srcA")).toDF("doc_id", "source")
    val got = df.select(propOf("${doc_id}-x-${source}").bind(df).as("v"))
      .head().getString(0)
    assert(got === "d1-x-srcA")
    // leading/trailing literal text
    assert(df.select(propOf("id=${doc_id}!").bind(df).as("v"))
      .head().getString(0) === "id=d1!")
    // a mixed template with new Date() binds the attribute AND a timestamp
    val stamped = df.select(propOf("${doc_id} at ${new Date()}").bind(df).as("v"))
      .head().getString(0)
    assert(stamped.startsWith("d1 at ") && stamped.length > "d1 at ".length)
  }

  test("unrecognized token expressions raise at bind time") {
    val df = Seq(("d1", "s")).toDF("doc_id", "source")
    val e = intercept[IllegalArgumentException] {
      df.select(propOf("${doc_id.someGroovyCall()}").bind(df))
    }
    assert(e.getMessage.contains("unsupported token expression"))
  }

  test("postProcessor raises on partially-recognized chains") {
    val df = Seq("ab c").toDF("v")
    // fully recognized: ok
    df.select(propOf("${v}", Some("${it?.toUpperCase()?.trim()}")).bind(df))
    // reference PostCode.format form with a call argument: ok
    assert(df.select(
      propOf("${v}", Some("${com.pontusvision.utils.PostCode.format(eachPostCode)}"))
        .bind(df).as("v")).head().getString(0) === "AB C")
    // recognized step + unrecognized step: must raise, not silently skip
    val e = intercept[IllegalArgumentException] {
      df.select(propOf("${v}", Some("${it?.toUpperCase()?.reverse()}")).bind(df))
    }
    assert(e.getMessage.contains("unrecognized steps"))
    // a recognized-PREFIX step name is not that step
    val e2 = intercept[IllegalArgumentException] {
      df.select(propOf("${v}", Some("${it?.trimIndent()}")).bind(df))
    }
    assert(e2.getMessage.contains("unrecognized steps"))
  }
}

/** Rules-driven edges: the rule doc's edge list drives Edges.emit with
  * vertex-rule key bindings — the loop the reference closes from the same
  * document (flow.xml:1298-1307).
  */
class RulesEdgesSpec extends SparkSpec {
  import spark.implicits._

  private val doc =
    """{"updatereq":{"vertices":[
      |  {"label":"User","props":[
      |    {"name":"uid","val":"${user}","predicate":"eq","mandatoryInSearch":true}]},
      |  {"label":"EventType","props":[
      |    {"name":"etype","val":"${etype}","predicate":"eq","mandatoryInSearch":true}]}],
      | "edges":[{"label":"acted","fromVertexLabel":"User","toVertexLabel":"EventType"}]}}"""
      .stripMargin

  test("emitEdges derives labeled edges from the rule doc's edge list") {
    val rules = UpdateReq.parse(doc)
    val df = Seq((1L, "u1", "click"), (2L, "u1", "click"), (3L, "u2", "view"))
      .toDF("lsn", "user", "etype")
    val got = rules.emitEdges(df, lsn = Some(col("lsn")))
      .orderBy("from_id", "to_id").collect()
    assert(got.length === 2)
    assert(got(0).getAs[String]("edge_label") === "acted")
    assert(got(0).getAs[String]("from_id") === "u1")
    assert(got(0).getAs[String]("to_id") === "click")
    assert(got(0).getAs[Long]("n_obs") === 2L)
    assert(got(0).getAs[Long]("min_lsn") === 1L && got(0).getAs[Long]("max_lsn") === 2L)
    assert(got(1).getAs[String]("from_id") === "u2")
  }

  test("rules-driven edges flow through the MERGE kernel across batches") {
    val rules = UpdateReq.parse(doc)
    val work = tmpDir("rules-edges")
    val table = LakeTable(s"$work/t")
    val rows = Seq((1L, "u1", "click"), (2L, "u1", "click"), (3L, "u2", "view"),
      (4L, "u1", "click"), (5L, "u2", "view"), (6L, "u3", "click"))
    rows.grouped(3).zipWithIndex.foreach { case (part, b) =>
      val df = part.toDF("lsn", "user", "etype")
      val edges = rules.emitEdges(df, lsn = Some(col("lsn")))
      MergeInto.apply(spark, table, Edges.asChanges(edges, b.toLong), "re", b.toLong,
        MergeConfig(numBuckets = 4, columnPolicy = Edges.mergePolicies,
          initialSchema = Some(Edges.tableSchema)))
    }
    val got = table.read(spark)
      .select("from_id", "to_id", "n_obs", "min_lsn", "max_lsn")
      .orderBy("from_id", "to_id").collect()
    assert(got.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq === Seq(
      ("u1", "click", 3L, 1L, 4L),
      ("u2", "view", 2L, 3L, 5L),
      ("u3", "click", 1L, 6L, 6L)))
  }

  test("edge endpoints referencing a missing vertex rule raise") {
    val bad = UpdateReq.parse(
      """{"updatereq":{"vertices":[
        |  {"label":"User","props":[
        |    {"name":"uid","val":"${user}","predicate":"eq","mandatoryInSearch":true}]}],
        | "edges":[{"label":"acted","fromVertexLabel":"User","toVertexLabel":"Ghost"}]}}"""
        .stripMargin)
    val df = Seq((1L, "u1")).toDF("lsn", "user")
    intercept[IllegalArgumentException](bad.emitEdges(df))
  }
}

/** Round-4 dead-letter refinements: no empty quarantine dirs, reject count
  * folded into the stats pass.
  */
class DeadLetterDirSpec extends SparkSpec {
  import spark.implicits._

  private def batchDf(events: Seq[RawEvent]): DataFrame =
    ChangeGen.projectPhase(events.toDF(), Phase(0, Long.MaxValue)).drop("seg")

  test("an all-good batch creates no dead-letter dir (no _SUCCESS-only dirs)") {
    val work = tmpDir("dlq-clean")
    val table = LakeTable(s"$work/t")
    val evs = (1 to 20).map(i =>
      RawEvent(i.toLong, s"k$i", Ops.Insert, Array(i), 1, "s", null, 0))
    MergeInto.apply(spark, table, batchDf(evs), "cp", 0L,
      MergeConfig(numBuckets = 4, deadLetterDir = Some(s"$work/dlq")))
    assert(table.read(spark).count() === 20)
    assert(!new java.io.File(s"$work/dlq/cp=cp/batch=0").exists(),
      "all-good batch must not create a quarantine dir")
    // a later batch WITH rejects still writes its own dir
    val bad = Seq((21L, null.asInstanceOf[String], "U", Seq(1), 1, "s"))
      .toDF("lsn", "doc_id", "op", "tokens", "n_tok", "source")
    MergeInto.apply(spark, table, batchDf(evs.take(1)).unionByName(bad), "cp", 1L,
      MergeConfig(numBuckets = 4, deadLetterDir = Some(s"$work/dlq")))
    val dlq = spark.read.parquet(s"$work/dlq/cp=cp/batch=1")
    assert(dlq.count() === 1)
  }
}
