package graft.operators

import graft.model.ChangeEvent
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-stream application: the engine's MERGE.
  *
  * The reference applies changes row-at-a-time against ClickHouse — batch
  * `INSERT` for inserts (reference: clickhouse/client.go:129-230), one
  * `ALTER TABLE … UPDATE/DELETE` mutation per updated/deleted row
  * (reference: clickhouse/client.go:246-343) — and leans on the documented
  * `ReplacingMergeTree ORDER BY (pk)` sink engine for last-write-wins
  * collapse of replayed/duplicate keys (reference: README.md:44-56, 161).
  *
  * Here the same observable semantics become a set-oriented MERGE per
  * micro-batch: collapse the batch to the latest event per key (one shuffle
  * on the key), anti-join the target against the touched keys, union the
  * surviving after-images. Deterministic under any partitioning because
  * ordering rides in the explicit `_seq` column (the reference got ordering
  * from its single-threaded sync loop, river/river.go:43-52).
  *
  * Scale notes: the window collapse and the anti-join shuffle on the same
  * key columns, so AQE reuses the exchange; in the streaming path the
  * change side of the anti-join is a micro-batch and is broadcast.
  */
object CdcMerge {
  import ChangeEvent.{OpCol, SeqCol, OpDelete, OpInsert, OpUpdate}

  /** Collapse a change set to the latest event per key by `_seq` —
    * the ReplacingMergeTree-FINAL equivalence (SURVEY §2.4 A1). */
  def latestByKey(changes: DataFrame, keyCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(SeqCol).desc)
    changes
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Per-key OLD and NEW images in ONE aggregate over
    * pre-batch-state ∪ batch — the fused form of "latestByKey collapse,
    * then compare old vs new" that the incrementally-maintained views
    * (AggView/MinMaxView) run per micro-batch. Output: one row per key
    * in `batch` with two structs of `imageCols :+ _op`:
    *
    *   - `_new` — the max-`_seq` row overall, exactly the
    *     [[latestByKey]] winner (a stored-vs-redelivered tie carries
    *     identical images; the batch row is preferred for determinism);
    *   - `_old` — the max-`_seq` row of the STATE side alone, null for
    *     a never-seen key.
    *
    * One exchange (the groupBy) replaces the window collapse plus the
    * old-vs-new join/anti-join the unfused form pays — the views derive
    * their ±delta / retire-assert events scan-locally from the two
    * structs. `state` must be the pre-batch images of exactly the
    * batch's keys ([[graft.streaming.BucketedState.stateForKeys]] with
    * `beforeBatch`), tombstones included, so replay determinism is the
    * caller's version-bounded read. */
  def oldNewImages(state: DataFrame, batch: DataFrame,
      keyCols: Seq[String], imageCols: Seq[String]): DataFrame = {
    val img = struct((imageCols.map(col) :+ col(OpCol)): _*)
    val ord = struct(col(SeqCol),
      when(col("_from_state"), lit(0)).otherwise(lit(1)).as("_pref"))
    state.withColumn("_from_state", lit(true))
      .unionByName(batch.withColumn("_from_state", lit(false)))
      .groupBy(keyCols.map(col): _*)
      .agg(
        max_by(img, ord).as("_new"),
        max_by(when(col("_from_state"), img),
          when(col("_from_state"), ord)).as("_old"))
  }

  /** Drop change ops per the mutation-ignore flags (reference `-update` /
    * `-delete` CLI flags, default true = drop; clickhouse/client.go:240-243,
    * 252-254, 273-275 — insert-only is the reference's default posture). */
  def filterOps(changes: DataFrame, ignoreUpdates: Boolean,
      ignoreDeletes: Boolean): DataFrame = {
    var out = changes
    if (ignoreUpdates) out = out.filter(col(OpCol) =!= OpUpdate)
    if (ignoreDeletes) out = out.filter(col(OpCol) =!= OpDelete)
    out
  }

  /** MERGE a change batch into a target snapshot.
    *
    * Default (batch) path: the target rides along as op=I rows at
    * `_seq = Long.MinValue`, unioned with the changes, and ONE
    * latest-by-key collapse resolves the merge — a single
    * Exchange + WindowGroupLimit over target+changes, no join. (The
    * previous anti-join formulation computed the change collapse twice:
    * two independent window/exchange subtrees that ReuseExchange could
    * not dedup because their projections differed.)
    *
    * Broadcast (micro-batch) path: when the change set is tiny against a
    * huge target, shuffling the whole target per batch is the wrong
    * trade; instead anti-join the target against the batch's DISTINCT
    * keys (broadcast, map-side — a keys-only partial aggregate, not a
    * second window) and union the collapsed after-images.
    *
    * @param changes target's columns + `_op` ("I"|"U"|"D") + `_seq` (long)
    * @param broadcastChanges hint the change side for broadcast — right for
    *        streaming micro-batches (small change set vs big target); leave
    *        false for batch backfills so the merge is one shuffle total.
    */
  def applyChanges(
      target: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      ignoreUpdates: Boolean = false,
      ignoreDeletes: Boolean = false,
      broadcastChanges: Boolean = false): DataFrame = {
    val payloadCols = target.columns.toSeq
    val effective = filterOps(changes, ignoreUpdates, ignoreDeletes)
    if (broadcastChanges) {
      val touchedKeys = effective.select(keyCols.map(col): _*).distinct()
      val survivors = target.join(
        broadcast(touchedKeys), keyCols, "left_anti")
      val upserts = latestByKey(effective, keyCols)
        .filter(col(OpCol) =!= OpDelete)
        .select(payloadCols.map(col): _*)
      survivors.unionByName(upserts)
    } else {
      val targetAsChanges = target
        .withColumn(OpCol, lit(OpInsert))
        .withColumn(SeqCol, lit(Long.MinValue))
      val upserts = lastWriteWins(
        targetAsChanges.unionByName(
          effective.select((payloadCols :+ OpCol :+ SeqCol).map(col): _*)),
        keyCols)
      upserts.select(payloadCols.map(col): _*)
    }
  }

  /** Final state of a change stream applied to an empty target:
    * latest non-delete after-image per key. */
  def lastWriteWins(changes: DataFrame, keyCols: Seq[String]): DataFrame =
    latestByKey(changes, keyCols)
      .filter(col(OpCol) =!= OpDelete)
      .drop(OpCol, SeqCol)

  /** Changed-column projection for update events (reference emits only the
    * columns whose before/after values differ, via reflect.DeepEqual —
    * river/sync.go:356-383). Input carries `before` / `after` structs with
    * identical fields; output = key cols + `changed_cols` (comma-joined
    * sorted names of columns that differ, null-safe comparison).
    */
  def changedColumns(updates: DataFrame, keyCols: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    val flags = valueCols.sorted.map { c =>
      when(not(col(s"before.$c") <=> col(s"after.$c")), lit(c))
        .otherwise(lit(null: String))
    }
    updates.select(
      keyCols.map(col) :+ concat_ws(",", flags: _*).as("changed_cols"): _*)
  }

  /** Normalize update events that carry both row images into key-stable
    * I/U/D events. An update that CHANGES the primary key acts as
    * delete(before-key) + insert(after-image) — the reference detects
    * `beforeID != afterID` and emits exactly that pair
    * (river/sync.go:219-233, asserted river/river_test.go:320, 355-360).
    * Key-stable updates pass through as a single U of the after-image.
    *
    * Input: `keyCols`-typed fields inside `before`/`after` structs plus
    * `_seq`; output: after-image payload columns + `_op` + `_seq`, where
    * the delete half ranks just below its paired insert (seq*2 vs
    * seq*2+1) so a same-key re-insert beats the delete. */
  def normalizeUpdates(updates: DataFrame, keyCols: Seq[String],
      payloadCols: Seq[String]): DataFrame = {
    val keyChanged = keyCols
      .map(k => not(col(s"before.$k") <=> col(s"after.$k")))
      .reduce(_ || _)
    val afterPayload = payloadCols.map(c => col(s"after.$c").as(c))
    val beforeKeyRow = payloadCols.map { c =>
      if (keyCols.contains(c)) col(s"before.$c").as(c)
      else lit(null).cast(updates.select(col(s"before.$c")).schema
        .head.dataType).as(c)
    }
    val stable = updates.filter(!keyChanged)
      .select(afterPayload :+ lit(OpUpdate).as(OpCol)
        :+ (col(SeqCol) * 2 + 1).as(SeqCol): _*)
    val pkDelete = updates.filter(keyChanged)
      .select(beforeKeyRow :+ lit(OpDelete).as(OpCol)
        :+ (col(SeqCol) * 2).as(SeqCol): _*)
    val pkInsert = updates.filter(keyChanged)
      .select(afterPayload :+ lit(OpInsert).as(OpCol)
        :+ (col(SeqCol) * 2 + 1).as(SeqCol): _*)
    stable.unionByName(pkDelete).unionByName(pkInsert)
  }

  /** Running I/U/D counters (reference: atomic counters surfaced on /stat,
    * river/status.go:19-21, river/sync.go:202-234). */
  def opCounts(changes: DataFrame): DataFrame =
    changes.groupBy(col(OpCol).as("op")).agg(count(lit(1)).as("n"))

  /** PK null guard (P7): a change row with a null key column is a hard
    * error — the reference aborts the stream on it (river/sync.go:402-405).
    * `raise_error` fires during the scan of the offending partition, so
    * the batch fails before any state is written. The message names the
    * route/table and the specific null column(s), so an operator reading
    * the abort (or Observability's last_error) knows WHICH table and key
    * killed the stream without replaying the batch. */
  def requireKeys(changes: DataFrame, keyCols: Seq[String],
      route: String = ""): DataFrame = {
    val anyNull = keyCols.map(col(_).isNull).reduce(_ || _)
    // per-row list of exactly the key columns that are null
    // (concat_ws skips the non-null ones' whens)
    val nullCols = concat_ws(",",
      keyCols.map(k => when(col(k).isNull, lit(k))): _*)
    val table = if (route.isEmpty) "?" else route
    // a filter (not a dropped projection) so the optimizer cannot prune
    // the error expression away
    changes.filter(
      when(anyNull, raise_error(concat(
        lit(s"null primary key in change event: table=$table null_cols="),
        nullCols, lit(" op="), col(OpCol))).cast("boolean"))
        .otherwise(lit(true)))
  }

  val allOps: Seq[String] = Seq(OpInsert, OpUpdate, OpDelete)
}
