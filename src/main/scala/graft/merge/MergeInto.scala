package graft.merge

import graft.model.{Ops, SchemaEvolution, Schemas}
import graft.table.{FileEntry, LakeTable, Manifest}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.util.UUID

/** Result of applying one micro-batch. */
final case class MergeResult(
    snapshotId: String,
    version: Long,
    lineage: Seq[graft.model.LineageRow],
    skipped: Boolean)

/** Tuning knobs for the MERGE kernel.
  *
  * @param numBuckets   key-partition count of the table (fixed at creation).
  *                     At 100 TB this is the unit of rewrite amplification:
  *                     more buckets => smaller rewrites per touched key,
  *                     more files. Size so one bucket's rewrite fits an
  *                     executor's shuffle memory.
  * @param saltFactor   >1 enables the two-stage salted dedupe: stage 1
  *                     pre-reduces each (doc_id, salt) group with a
  *                     struct-max (map-side combine absorbs hot keys),
  *                     stage 2 runs the final row_number window over at most
  *                     `saltFactor` rows per key. Default 0 (plain window):
  *                     measured plans show Spark 4's WindowGroupLimit
  *                     already performs a map-side partial top-1-per-key
  *                     before the exchange, which bounds a hot key to
  *                     #map-partitions rows post-shuffle — the salting
  *                     stage costs an extra SortAggregate + Exchange for
  *                     no additional skew protection (see BENCH.md).
  * @param broadcastThreshold  raw batch row count below which the changes
  *                     side of the MERGE join is broadcast (no shuffle of
  *                     the rewritten target buckets) — the trickle-batch
  *                     fast path. Large batches use the shuffle merge:
  *                     measured crossover is a few 100k rows (driver-side
  *                     broadcast build is serial; see BENCH.md).
  */
/** Per-column update policy — the reference's declarative `updatereq`
  * per-property rules (`flow.xml:1163-1307`: `excludeFromUpdate`,
  * coalescing post-processors). Applies only to a genuine UPDATE of a
  * live row; inserts (and re-inserts over a tombstone) always take the
  * incoming value.
  */
sealed trait ColumnPolicy
object ColumnPolicy {
  /** Default: winning change overwrites the stored value. */
  case object Overwrite extends ColumnPolicy
  /** Value is fixed at insert time; updates never touch it
    * (`excludeFromUpdate` in the updatereq rule doc).
    */
  case object ExcludeFromUpdate extends ColumnPolicy
  /** A null incoming value keeps the stored one (sparse updates). */
  case object CoalesceExisting extends ColumnPolicy
  /** Accumulating policies for metric-bearing rows (edge observation
    * counts / LSN ranges, the reference's incremental edge upserts,
    * `flow.xml:1298-1307`): a genuine update folds the incoming value
    * into the stored one instead of replacing it. Correct across batches
    * because batch LSNs are monotone per key and the exactly-once ledger
    * prevents a replayed batch from folding twice; a genuinely STALE
    * change (lower LSN than stored) is dropped, not folded.
    */
  case object AddExisting extends ColumnPolicy
  case object MinExisting extends ColumnPolicy
  case object MaxExisting extends ColumnPolicy
}

final case class MergeConfig(
    numBuckets: Int = 32,
    saltFactor: Int = 0,
    broadcastThreshold: Long = 200000L,
    lineageDir: Option[String] = None,
    deadLetterDir: Option[String] = None,
    commitRetries: Int = 3,
    preCommitHook: () => Unit = () => (),
    columnPolicy: Map[String, ColumnPolicy] = Map.empty,
    /** Newest ledger entries kept per checkpoint; older ones fold into the
      * manifest's batch floor (exact idempotence at O(retention) manifest
      * bytes — see [[graft.table.Manifest]]).
      */
    ledgerRetention: Int = 1024,
    /** Logical schema a FRESH table starts from (defaults to the
      * tokenized-sequence shape). Non-seq-shaped tables — e.g. an edges
      * table keyed by edge key — pass their own base so evolution doesn't
      * graft the seq columns onto them.
      */
    initialSchema: Option[StructType] = None,
    /** Merge-on-read trickle path: a batch with at most this many raw
      * rows APPENDS delta files to its touched buckets instead of
      * rewriting them — no target read, no join, write O(batch) instead
      * of O(touched buckets' data). Readers resolve last-writer-wins at
      * scan time and compaction folds deltas back into base files, so
      * the final state is identical to the rewrite path (DeltaAppendSpec
      * proves equivalence batch-size-independently). 0 (default) = off.
      * Ignored when `columnPolicy` is non-empty (policies need the
      * stored row) and for bootstrap batches into untouched buckets.
      * Lineage for delta batches is op-typed (an I counts as insert, a
      * U/UPSERT as update, a D as delete) since match status is unknown
      * without reading the target.
      */
    deltaAppendThreshold: Long = 0L,
    /** Row-count ceiling for the SINGLE-TASK merge plan (round 6): when
      * the batch (and, for the rewrite path, batch + touched-target rows
      * from the manifest stats) fits under this, the merge coalesces its
      * inputs to one partition FIRST — SinglePartition satisfies every
      * downstream clustering requirement, so dedupe window, full-outer
      * join and the bucket-partitioned write all plan as ONE exchange-free
      * single-task stage (one Spark job instead of 3-4 per batch). This is
      * scale-ADAPTIVE, not a local-mode constant: at any cluster size, a
      * sub-100k-row micro-batch is dominated by per-job scheduling floor,
      * and one task bounded by this row count cannot skew or spill.
      * Batches above the ceiling keep the parallel plans unchanged.
      * Default = [[graft.table.LakeTable.SingleTaskRows]], the table
      * layer's shared single-task rule.
      */
    singleTaskRows: Long = graft.table.LakeTable.SingleTaskRows,
    /** Compute the per-status lineage counters (n_insert / n_update /
      * n_delete / n_dedup_dropped) via the post-write `_status` read-back
      * job. IMPLIED by `lineageDir` (persisted lineage must be exact).
      * Off by default (round 6): the read-back is one extra Spark job on
      * the per-batch serial path — O(rewritten buckets) rows scanned
      * purely for observability counters — and the fields the engine
      * itself consumes (per-bucket LSN ranges, batch/snapshot ids; the
      * stream's tombstone-GC watermark reads `max_lsn`) come exactly
      * from the driver-side pre-pass stats either way. When off and no
      * `lineageDir` is set, `MergeResult.lineage` rows carry -1 in the
      * four counter fields (explicitly "not computed", never a silent 0).
      */
    statusCounts: Boolean = false)

/** The MERGE INTO kernel: apply one micro-batch of change events to a
  * [[LakeTable]] with last-writer-wins by (doc_id, lsn), schema evolution,
  * bucket-pruned rewrite, delete tombstones, per-partition lineage, and an
  * idempotent CAS commit.
  *
  * Spark-first re-expression of the reference's match-or-create upsert
  * (`PontusIdGenerator.java:266-381`: scan keyed store -> 1 match = update,
  * 0 = insert; commit/rollback at :361-378) and its bulk micro-batch client
  * (`PontusTinkerPopClientRecordBulk.java:91-126`: one upsert query per
  * drained batch): the whole micro-batch becomes ONE set-oriented
  * full-outer equi-join on the merge key, touching only the buckets the
  * batch's keys hash to, instead of a per-record RPC.
  *
  * Deletes write tombstone rows (`_tombstone = true`, lsn = delete LSN) so
  * that an out-of-order *older* event arriving in a later batch cannot
  * resurrect a deleted key, while a genuinely newer upsert can.
  */
object MergeInto {

  val TOMBSTONE: String = LakeTable.TOMBSTONE

  /** Diagnostics hook (system property `graft.merge.explain`): retains the
    * formatted plan of the last batch's write frame so plan-shape claims
    * (e.g. "a small batch's merge is a single exchange-free stage") are
    * assertable in specs and capturable for the committed plan artifacts
    * without touching the write path. Driver-side, test/tooling only.
    */
  @volatile private[graft] var lastWritePlan: Option[String] = None

  private val timingOn = sys.env.contains("GRAFT_MERGE_TIMING")
  private def timed[T](what: String)(f: => T): T =
    if (!timingOn) f
    else {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[merge-timing] $what: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

  private def storedSchema(logical: StructType): StructType =
    LakeTable.storedSchema(logical)

  /** Dedupe a batch to one winning event per doc_id (last-writer-wins by
    * highest lsn). The final stage is the north-rule shape:
    * `row_number() over (partition by doc_id order by lsn desc) = 1`.
    * With `saltFactor > 1` a salted pre-reduction runs first so a hot key
    * (Zipf head) never concentrates a full window partition on one task:
    * stage 1 groups by (doc_id, xxhash64(lsn) % S) and keeps the max-by-lsn
    * row via a partial-aggregable struct max (map-side combine), leaving
    * <= S rows per key for the final window.
    */
  def dedupeLatest(batch: DataFrame, saltFactor: Int): DataFrame = {
    val cols = batch.columns.toIndexedSeq
    val pre =
      if (saltFactor <= 1) batch
      else {
        val payload = struct((col("lsn") +: cols.filterNot(_ == "lsn").map(col)): _*)
        batch
          .groupBy(col("doc_id"), pmod(xxhash64(col("lsn")), lit(saltFactor.toLong)).as("_salt"))
          .agg(max(payload).as("_w"))
          .select(cols.map(c => col(s"_w.$c").as(c)): _*)
      }
    val w = Window.partitionBy(col("doc_id")).orderBy(col("lsn").desc)
    pre.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Structural type equality ignoring nullability/containsNull flags. */
  def sameTypeIgnoreNull(a: DataType, b: DataType): Boolean = (a, b) match {
    case (ArrayType(ea, _), ArrayType(eb, _)) => sameTypeIgnoreNull(ea, eb)
    case (MapType(ka, va, _), MapType(kb, vb, _)) =>
      sameTypeIgnoreNull(ka, kb) && sameTypeIgnoreNull(va, vb)
    case (StructType(fa), StructType(fb)) =>
      fa.length == fb.length && fa.zip(fb).forall { case (x, y) =>
        x.name == y.name && sameTypeIgnoreNull(x.dataType, y.dataType)
      }
    case _ => a == b
  }

  /** Align `df` to `target` schema: add missing columns as nulls, cast
    * widened columns, order columns. Columns differing only in nullability
    * are passed through uncast.
    */
  def alignTo(df: DataFrame, target: StructType): DataFrame = {
    val have = df.schema.fields.map(f => f.name -> f.dataType).toMap
    df.select(target.fields.toIndexedSeq.map { f =>
      have.get(f.name) match {
        case Some(dt) if sameTypeIgnoreNull(dt, f.dataType) => col(f.name)
        case Some(_) => col(f.name).cast(f.dataType).as(f.name)
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }: _*)
  }

  /** Apply one micro-batch to `table`. Idempotent per (checkpointId,
    * batchId): if the ledger already records this batch, the call is a
    * no-op returning the committed snapshot. Safe under concurrent
    * writers: a lost manifest CAS re-runs the merge against the winner's
    * snapshot (the loser's staged files become orphans for vacuum), up to
    * `commitRetries` attempts.
    */
  def apply(
      spark: SparkSession,
      table: LakeTable,
      batch: DataFrame,
      checkpointId: String,
      batchId: Long,
      cfg: MergeConfig = MergeConfig()): MergeResult = {
    var attempt = 0
    while (true) {
      try return applyOnce(spark, table, batch, checkpointId, batchId, cfg)
      catch {
        case e: graft.table.CommitConflictException =>
          attempt += 1
          if (attempt > cfg.commitRetries) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def applyOnce(
      spark: SparkSession,
      table: LakeTable,
      batch0: DataFrame,
      checkpointId: String,
      batchId: Long,
      cfg: MergeConfig): MergeResult = {

    // -- -1. dead-letter routing (the reference's failure relationship,
    // PontusTinkerPopClient.java:213-258): structurally invalid events
    // (null key / null lsn / unknown op) divert to a quarantine table at a
    // deterministic per-batch path (idempotent overwrite) instead of
    // corrupting the merge.
    // `good` is two-valued by construction (coalesce over the three-valued
    // op membership test): a null op must land in the rejects, not vanish
    // from both sides of the split.
    // Single-pass: the batch is cached once, the reject COUNT rides the
    // stats pre-pass below (no extra probe job), the rejects write runs
    // only when rejects exist (an all-good batch must not leave a
    // _SUCCESS-only empty dir that breaks downstream schema inference),
    // and the merge's own stats/dedupe/join scans read the cache instead
    // of re-reading the source. Unpersisted in the finally below, which
    // also covers a throwing rejects write.
    val goodPred = col("doc_id").isNotNull && col("lsn").isNotNull &&
      coalesce(col("op").isInCollection(Ops.all), lit(false))
    val (batch, cachedBatch) = cfg.deadLetterDir match {
      case None => (batch0, None)
      case Some(_) =>
        val cached = batch0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        (cached.filter(goodPred), Some(cached))
    }
    try {

    val current = timed("manifest-read")(table.currentManifestOpt())

    // -- 0. idempotence: replayed batch => no-op ------------------------
    val ledgerKey = s"$checkpointId/$batchId"
    current.filter(_.isCommitted(checkpointId, batchId)) match {
      case Some(m) =>
        val snap = m.snapshotIdOf(checkpointId, batchId).getOrElse(m.snapshotId)
        return MergeResult(snap, m.version, Nil, skipped = true)
      case None => ()
    }

    val numBuckets = current.map(_.numBuckets).getOrElse(cfg.numBuckets)

    // -- 1. schema evolution -------------------------------------------
    // Logical table columns = seq-table shape + any extra change columns
    // seen so far (ADD COLUMN), types widened per the lattice. `op` stays
    // feed-only.
    val tableSchema = current.map(_.schema)
      .orElse(cfg.initialSchema)
      .getOrElse(Schemas.seqTable)
    val incomingAsTable = StructType(
      batch.schema.fields.filterNot(_.name == "op").toIndexedSeq)
    val evolved = SchemaEvolution.evolve(tableSchema, incomingAsTable)

    // -- 2. ONE pre-pass over the batch: touched buckets, per-bucket raw
    // counts, distinct keys (== post-dedupe rows), LSN ranges. Partial-
    // aggregable, <= numBuckets (+1 reject group) result rows. In
    // dead-letter mode the scan runs over the CACHED unfiltered frame with
    // a `_good` flag so the reject count comes out of the same job.
    val bucketOf: Column => Column =
      k => pmod(xxhash64(k), lit(numBuckets.toLong)).cast("int")
    val rawStats = timed("batch-stats")(cachedBatch.getOrElse(batch)
      .groupBy((if (cachedBatch.isDefined) goodPred else lit(true)).as("_good"),
        bucketOf(col("doc_id")).as("_bucket"))
      .agg(count(lit(1)).as("n_raw"),
        min("lsn").as("minL"), max("lsn").as("maxL"))
      .collect())
    val batchStats = rawStats.filter(_.getBoolean(0))
      .map(r => r.getInt(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap // bucket -> (n_raw, minL, maxL)
    val rejectCount = rawStats.filterNot(_.getBoolean(0)).map(_.getLong(2)).sum
    if (rejectCount > 0) cfg.deadLetterDir.foreach { dir =>
      // before the commit (a crash between commit and a later rejects
      // write would skip them on replay), idempotent overwrite path
      cachedBatch.get.filter(!goodPred).write.mode("overwrite")
        .parquet(s"$dir/cp=$checkpointId/batch=$batchId")
    }
    val touched: Set[Int] = batchStats.keySet

    if (touched.isEmpty) {
      // empty batch: still record the ledger entry (exactly-once bookkeeping)
      return commitManifest(table, current, evolved, numBuckets,
        Set.empty, Nil, ledgerKey, ledgerRetention = cfg.ledgerRetention)
    }
    // conservative broadcast decision: raw count >= deduped count
    val rawRows = batchStats.valuesIterator.map(_._1).sum

    // manifest-LIST pruning, hoisted above the dedupe (driver-side
    // metadata only): only the ranges the batch touches are even opened,
    // untouched buckets carry over by reference with no metadata or data
    // I/O — the analog of the reference pushing its filter into the keyed
    // store, PontusIdGenerator.java:299
    val touchedFiles = current.map(m => table.filesOf(m, Some(touched))).getOrElse(Nil)

    // merge-on-read trickle path decided EARLY (from the pre-pass stats)
    // so the dedupe below can pick its plan shape per path
    val isDeltaAppend = cfg.deltaAppendThreshold > 0 &&
      rawRows <= cfg.deltaAppendThreshold &&
      cfg.columnPolicy.isEmpty && touchedFiles.nonEmpty

    // -- 3. dedupe to one winner per key, salted against skew -----------
    // A SMALL batch coalesces to one partition FIRST: SinglePartition
    // satisfies the window's clustering requirement (and, on the rewrite
    // path, the merge join's), so dedupe+join+project+sort+write all plan
    // as ONE exchange-free single-task stage (guide §2.4) — one Spark job
    // per batch instead of 3-4 (window exchange, broadcast builds, keys
    // scan). Decided from sizes the driver already has: the stats
    // pre-pass gives rawRows, the manifest file stats give the touched
    // buckets' stored rows. Batches above `singleTaskRows` keep the
    // parallel plans unchanged.
    val targetRows = touchedFiles.map(_.rows).sum
    val deltaSingleTask = isDeltaAppend && rawRows <= cfg.singleTaskRows
    val mergeSingleTask = !isDeltaAppend &&
      rawRows + targetRows <= cfg.singleTaskRows
    val deduped = dedupeLatest(
      if (deltaSingleTask || mergeSingleTask) batch.coalesce(1) else batch,
      cfg.saltFactor)

    // -- 4. read ONLY the touched buckets of the target -----------------
    // (touchedFiles hoisted above the dedupe — see the pruning note there)
    val storedOld = storedSchema(tableSchema)
    val storedNew = storedSchema(evolved)
    // delta files carry multiple versions per key: the target side of the
    // join must be LWW-resolved first or matched keys would fan out
    // (resolution windows ONLY the delta-bearing buckets)
    // the single-task merge coalesces the target scan BELOW any delta
    // resolution window, keeping the whole plan exchange-free even when
    // the touched buckets carry deltas
    def scanTarget(): DataFrame =
      alignTo(table.scanResolved(spark, storedOld, touchedFiles,
        singlePartition = mergeSingleTask), storedNew)

    // -- 5. MERGE join on the key ---------------------------------------
    val dataCols = evolved.fieldNames.filterNot(_ == "doc_id").toIndexedSeq
    val ch = alignTo(
      deduped.withColumn("_has_change", lit(true)),
      StructType(evolved.fields.toIndexedSeq :+ StructField("op", StringType) :+
        StructField("_has_change", BooleanType)))

    // insert-shaped projection of change rows that match no target row
    def insertProject(unmatchedCh: DataFrame): DataFrame = {
      val isDel = col("op") === Ops.Delete
      unmatchedCh.select(
        (col("doc_id") +:
          dataCols.map(col) :+
          isDel.as(TOMBSTONE) :+
          when(isDel, lit("delete_noop")).otherwise(lit("insert")).as("_status")): _*)
    }

    // matched/kept projection from a (target x change) join frame
    def matchProject(joined: DataFrame, hasTExpr: Column): DataFrame = {
      val hasT = hasTExpr
      val hasC = coalesce(col("c._has_change"), lit(false))
      // change wins iff present and as-new-as the stored row (replay-safe >=)
      val changeWins = hasC && (!hasT || col("c.lsn") >= col("t.lsn"))
      val isDelete = col("c.op") === Ops.Delete
      val wasTombstone = hasT && col(s"t.$TOMBSTONE")
      val status = when(!hasC, lit("keep"))
        .when(!changeWins, lit("stale"))
        .when(isDelete && hasT && !wasTombstone, lit("delete"))
        .when(isDelete, lit("delete_noop"))
        .when(hasT && !wasTombstone, lit("update"))
        .otherwise(lit("insert"))
      // genuine UPDATE of a live row — the only case column policies gate
      val genuineUpdate = changeWins && hasT && !wasTombstone && !isDelete
      def valueOf(c: String): Column = {
        val base = when(changeWins, col(s"c.$c")).otherwise(col(s"t.$c"))
        cfg.columnPolicy.getOrElse(c, ColumnPolicy.Overwrite) match {
          case ColumnPolicy.Overwrite => base
          case ColumnPolicy.ExcludeFromUpdate =>
            when(genuineUpdate, col(s"t.$c")).otherwise(base)
          case ColumnPolicy.CoalesceExisting =>
            when(genuineUpdate, coalesce(col(s"c.$c"), col(s"t.$c"))).otherwise(base)
          case ColumnPolicy.AddExisting =>
            when(genuineUpdate, col(s"t.$c") + col(s"c.$c")).otherwise(base)
          case ColumnPolicy.MinExisting =>
            when(genuineUpdate, least(col(s"t.$c"), col(s"c.$c"))).otherwise(base)
          case ColumnPolicy.MaxExisting =>
            when(genuineUpdate, greatest(col(s"t.$c"), col(s"c.$c"))).otherwise(base)
        }
      }
      joined.select(
        (coalesce(col("t.doc_id"), col("c.doc_id")).as("doc_id") +:
          dataCols.map(c => valueOf(c).as(c)) :+
          when(changeWins, isDelete)
            .otherwise(coalesce(col(s"t.$TOMBSTONE"), lit(false))).as(TOMBSTONE) :+
          status.as("_status")): _*)
    }

    val useBroadcast = rawRows <= cfg.broadcastThreshold
    // merge-on-read trickle path: append deltas, skip the target read and
    // the join entirely; the LWW decision defers to scan-time resolution
    // (equivalent outcome for Overwrite-policy columns: the read window's
    // max-lsn winner == the kernel's change-wins-ties rule)
    val mergedFlat: DataFrame =
      if (isDeltaAppend) {
        val isDel = col("op") === Ops.Delete
        val status = when(isDel, lit("delete"))
          .when(col("op") === Ops.Insert, lit("insert"))
          .otherwise(lit("update"))
        alignTo(deduped, StructType(evolved.fields.toIndexedSeq :+
            StructField("op", StringType)))
          .select((col("doc_id") +: dataCols.map(col) :+
            isDel.as(TOMBSTONE) :+ status.as("_status")): _*)
      } else if (touchedFiles.isEmpty) {
        // nothing to match: the whole batch inserts (or tombstones)
        insertProject(ch)
      } else if (mergeSingleTask) {
        // SMALL rewrite batch: full-outer sort-merge join with BOTH sides
        // on a single partition — SinglePartition is co-partitioned with
        // itself, so the join (and the batch's dedupe window above it)
        // plans with ZERO exchanges and no broadcast-build jobs; the
        // whole merge is one single-task Spark job. Same matchProject
        // semantics as the large-batch shuffle path below. (scanTarget
        // already honors mergeSingleTask's single-partition contract.)
        val tg = scanTarget().withColumn("_has_target", lit(true))
        matchProject(
          tg.as("t").join(ch.as("c"),
            col("t.doc_id") === col("c.doc_id"), "full_outer"),
          hasTExpr = coalesce(col("t._has_target"), lit(false)))
      } else if (useBroadcast) {
        // Broadcast MERGE: the big target side NEVER shuffles. Spark's
        // BroadcastHashJoin cannot build a full-outer join, so decompose:
        //   (a) target LEFT OUTER broadcast(changes)   — matched + kept
        //   (b) changes LEFT ANTI broadcast(matchedKeys) — pure inserts,
        //       where matchedKeys comes from a keys-only (column-pruned)
        //       scan of the touched files semi-joined with the change keys
        val tg = scanTarget().withColumn("_has_target", lit(true))
        val leftPart = matchProject(
          tg.as("t").join(broadcast(ch).as("c"),
            col("t.doc_id") === col("c.doc_id"), "left_outer"),
          hasTExpr = lit(true))
        val targetKeys = spark.read.schema(storedOld)
          .parquet(touchedFiles.map(_.path): _*).select("doc_id")
        val matchedKeys = targetKeys
          .join(broadcast(deduped.select("doc_id")), Seq("doc_id"), "left_semi")
        val insertPart = insertProject(
          ch.join(broadcast(matchedKeys), Seq("doc_id"), "left_anti"))
        leftPart.unionByName(insertPart)
      } else {
        // large batch: shuffle full-outer merge (sort-merge join, AQE
        // handles skewed partitions). Note: a bucket-aligned variant
        // (repartition both sides on _bucket, join on (_bucket, doc_id),
        // write without shuffle) was measured 2.3x SLOWER at local scale —
        // manual repartition disables AQE coalescing and loses the window
        // exchange reuse; see BENCH.md.
        val tg = scanTarget().withColumn("_has_target", lit(true))
        matchProject(
          tg.as("t").join(ch.as("c"),
            col("t.doc_id") === col("c.doc_id"), "full_outer"),
          hasTExpr = coalesce(col("t._has_target"), lit(false)))
      }

    val merged = mergedFlat.withColumn("_bucket", bucketOf(col("doc_id")))

    // -- 6. write the merged buckets, KEEPING the _status column in the
    // staged files. Table reads are schema-first (explicit StructType), so
    // the extra column is pruned for free on every later scan; its cost is
    // ~1 dictionary-encoded byte/row once. The column exists to feed the
    // per-bucket status READ-BACK at step 8 (see there for the two
    // riding-the-write designs that were measured and rejected).
    val bucketIds = touched.toSeq.sorted
    val nextVersion = current.map(_.version + 1).getOrElse(0L)
    val staging = table.stagingDir(nextVersion)
    // a trickle delta batch writes ONE task (one small file per touched
    // bucket dir) — no point fanning a few thousand rows over N tasks.
    // coalesce(1), not repartition(1, _bucket): a keyed repartition into a
    // single partition is a full extra Exchange (and stage) that moves
    // every row to the same place coalesce reaches narrowly — identical
    // file content. With deltaSingleTask the input was already coalesced
    // ahead of the dedupe window, so the whole delta batch is ONE
    // exchange-free single-task stage (guide §2.4).
    val placed =
      if (deltaSingleTask || mergeSingleTask) merged
      else if (isDeltaAppend) merged.coalesce(1)
      else merged.repartition(touched.size.max(1), col("_bucket"))
    val toWrite = placed.sortWithinPartitions(col("_bucket"), col("doc_id"))
    if (sys.props.contains("graft.merge.explain"))
      lastWritePlan = Some(toWrite.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    timed("merge-write")(
      toWrite.write.partitionBy("_bucket").mode("overwrite").parquet(staging))

    // -- 7. manifest entries for the staged files, with per-file pruning
    // stats (rows, lsn min/max) harvested from the parquet FOOTERS —
    // exact, driver-side, no Spark job. (Rounds 1-4 ran a read-back
    // aggregation job here to get per-bucket stats; the footers already
    // hold them per file, finer-grained and free.)
    val newFiles = timed("enumerate-staged")(
      table.enumerateStagedWithStats(staging, isDelta = isDeltaAppend))

    // -- 8. per-bucket STATUS counts (insert/update/delete/noop/stale)
    // for the lineage metrics — the one thing footers cannot provide.
    // The read-back job runs ASYNC so it overlaps manifest composition
    // (both are per-batch latency with no data dependency) and joins
    // before the CAS via the finishLineage thunk below. Layout: columnar
    // scan of 2 columns of the just-written output, fixed plan shape
    // (codegen-cache-friendly across batches). Two riding-the-write
    // designs were measured and REJECTED in favor of it — (a) 8 x
    // numBuckets flat conditional aggregates in an Observation: a
    // 256-expression CollectMetrics re-analyzed + janino-recompiled
    // every batch, ~5 s serial driver time (round 2); (b) ONE
    // typed-Aggregator Observation: O(1) analysis, but the untyped-UDAF
    // per-row update runs on EVERY merged row inside the write stage and
    // CollectMetrics breaks whole-stage codegen around it — ~1.9 s/batch
    // SLOWER than the read-back on identical 255k-row batches (round 5,
    // A/B in BENCH.md).
    val readbackSchema = StructType(Seq(
      StructField("_status", StringType), StructField("_bucket", IntegerType)))
    // round 6: the read-back runs ONLY when a consumer needs the status
    // counters (lineageDir persistence or an explicit statusCounts opt-in)
    // — for every other caller it was a pure-observability Spark job on
    // the per-batch serial path (guide §1.2: don't compute things you
    // throw away)
    val wantCounts = cfg.statusCounts || cfg.lineageDir.isDefined
    val statF: Option[scala.concurrent.Future[Map[Int, Array[Long]]]] =
      if (!wantCounts) None
      else Some {
        import scala.concurrent.{ExecutionContext, Future}
        implicit val ec: ExecutionContext = ExecutionContext.global
        Future {
          spark.read.schema(readbackSchema).parquet(staging)
            .groupBy(col("_bucket"))
            .agg(
              sum(when(col("_status") === "insert", 1L).otherwise(0L)).as("nI"),
              sum(when(col("_status") === "update", 1L).otherwise(0L)).as("nU"),
              sum(when(col("_status") === "delete", 1L).otherwise(0L)).as("nD"),
              sum(when(col("_status") === "delete_noop", 1L).otherwise(0L)).as("nDn"),
              sum(when(col("_status") === "stale", 1L).otherwise(0L)).as("nS"))
            .collect()
            .map(r => r.getInt(0) -> Array(r.getLong(1), r.getLong(2),
              r.getLong(3), r.getLong(4), r.getLong(5)))
            .toMap
        }
      }

    val snapshotId = UUID.randomUUID().toString
    // Runs after manifest composition, immediately before the CAS: await
    // the status read-back, build the lineage rows, land the lineage
    // parquet (deterministic path + overwrite => exactly-once metrics; a
    // crash on either side of the commit replays to identical content).
    def finishLineage(): Seq[graft.model.LineageRow] = {
      val statRows: Map[Int, Array[Long]] = statF match {
        case Some(f) => timed("lineage-stats")(scala.concurrent.Await.result(
          f, scala.concurrent.duration.Duration.Inf))
        case None => Map.empty
      }
      val lineage = bucketIds.map { b =>
        val (nRaw, minL, maxL) = batchStats(b)
        val (nI, nU, nD, nDn, nS) = statRows.get(b) match {
          case Some(a) => (a(0), a(1), a(2), a(3), a(4))
          case None if wantCounts => (0L, 0L, 0L, 0L, 0L)
          // counters not computed this batch: -1 sentinels, never fake 0s
          case None => (-1L, -1L, -1L, 0L, 0L)
        }
        // rows that carried a change = the batch's distinct keys
        val nKeys = nI + nU + nD + nDn + nS
        graft.model.LineageRow(
          batch_id = batchId,
          partition = b,
          min_lsn = minL,
          max_lsn = maxL,
          n_insert = nI,
          n_update = nU,
          n_delete = if (wantCounts) nD + nDn else -1L,
          n_dedup_dropped = if (wantCounts) nRaw - nKeys else -1L,
          snapshot_id = snapshotId)
      }
      // driver-side parquet write ([[LineageWriter]]): a handful of rows
      // per batch doesn't justify a Spark job on the per-batch serial path
      cfg.lineageDir.foreach { dir =>
        timed("lineage-write")(LineageWriter.write(
          spark.sparkContext.hadoopConfiguration, dir, checkpointId, batchId,
          lineage))
      }
      lineage
    }

    cfg.preCommitHook()
    // delta append REMOVES nothing: touched = empty keeps every parent
    // file and composeManifests appends the delta entries to their ranges
    try
      timed("manifest-commit")(commitManifest(table, current, evolved, numBuckets,
        if (isDeltaAppend) Set.empty else touched, newFiles,
        ledgerKey, finishLineage, cfg.ledgerRetention, snapshotId, nextVersion))
    catch {
      case commitFailure: Throwable =>
        // the commit path can throw BEFORE finishLineage joins the async
        // status read-back (e.g. a manifest-compose error or a lost CAS):
        // drain the future here so no unobserved Spark job outlives the
        // batch with its own failure silently discarded
        statF.foreach { f =>
          try scala.concurrent.Await.ready(
            f, scala.concurrent.duration.Duration(60, "s")): Unit
          catch { case _: Throwable => () }
        }
        throw commitFailure
    }
    } finally cachedBatch.foreach(_.unpersist(false))
  }

  private def commitManifest(
      table: LakeTable,
      current: Option[Manifest],
      schema: StructType,
      numBuckets: Int,
      touched: Set[Int],
      newFiles: Seq[FileEntry],
      ledgerKey: String,
      /** Finalizes the batch's lineage (awaits the async status read-back
        * and lands the lineage parquet). Called AFTER manifest composition
        * and immediately BEFORE the CAS — the join point for work
        * overlapped with composition that must still precede the commit.
        */
      finishLineage: () => Seq[graft.model.LineageRow] = () => Nil,
      ledgerRetention: Int = 1024,
      snapshotId: String = UUID.randomUUID().toString,
      versionOverride: Long = -1L): MergeResult = {
    val version =
      if (versionOverride >= 0) versionOverride
      else current.map(_.version + 1).getOrElse(0L)
    val rawLedger =
      current.map(_.ledger).getOrElse(Map.empty) + (ledgerKey -> snapshotId)
    val (ledger, floor) = Manifest.compactLedger(rawLedger,
      current.map(_.floorBatch).getOrElse(Map.empty), ledgerRetention.max(1))
    // O(touched ranges + 1) metadata write: untouched ranges carry over
    // by reference; a no-change commit (empty batch) reuses the parent's
    // whole manifest list
    val manifests =
      if (touched.isEmpty && newFiles.isEmpty && current.exists(_.manifests.nonEmpty))
        current.get.manifests
      else table.composeManifests(current, touched, newFiles, numBuckets)
    val m = Manifest(
      version = version,
      snapshotId = snapshotId,
      parentSnapshotId = current.map(_.snapshotId),
      schemaJson = schema.json,
      numBuckets = numBuckets,
      files = Nil,
      ledger = ledger,
      floorBatch = floor,
      manifests = manifests)
    val lineage = finishLineage()
    table.commit(m)
    MergeResult(snapshotId, version, lineage, skipped = false)
  }
}
