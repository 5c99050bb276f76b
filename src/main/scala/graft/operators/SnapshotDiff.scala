package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot reconciliation — the inverse of CDC apply: given two
  * primary-keyed snapshots (a master table and a replica, or two
  * bootstrap generations), derive the minimal change set `I/U/D` that
  * turns one into the other. The repair story for a replication
  * pipeline: when a sink drifts (missed batch, manual edit, bootstrap
  * from a stale dump), diff master against the sink and push ONLY the
  * delta through the normal merge path instead of a full re-replace
  * (reference analog: the full-table re-sync in river/sync.go is the
  * sledgehammer this replaces).
  *
  * Shape: one full outer join keyed on the PK — the unavoidable
  * minimum for a diff — then a scan-local classification. Both sides
  * shuffle once on the key; against bucketed stores
  * ([[graft.streaming.BucketedState]]) the join is co-partitioned and
  * exchange-free. Row comparison is null-safe per column (`<=>`), so
  * NULL→value and value→NULL both classify as updates. */
object SnapshotDiff {

  /** `(op, …newColumns)` rows: `I` rows only in `target` (after
    * image), `U` rows whose non-key columns differ (after image), `D`
    * rows only in `current` (key columns only, payload NULL — the
    * tombstone shape [[CdcMerge]] consumes). Identical rows are
    * absent: applying the result to `current` via the normal merge
    * reproduces `target` exactly (spec-proven round trip). */
  def diff(current: DataFrame, target: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "diff: need at least one key column")
    val cols = target.columns.toSeq
    require(current.columns.toSeq == cols,
      s"diff: schemas differ: ${current.columns.toSeq} vs $cols")
    val payload = cols.filterNot(keyCols.contains)
    // explicit presence markers — robust even if a key column could
    // hold NULLs (the join's <=> would pair those; presence must not
    // depend on key nullability)
    val cur = current
      .select(cols.map(c => col(c).as(s"_cur_$c")) :+
        lit(true).as("_cur_present"): _*)
    val tgt = target
      .select(cols.map(c => col(c).as(s"_tgt_$c")) :+
        lit(true).as("_tgt_present"): _*)
    val joinCond = keyCols.map(k => col(s"_cur_$k") <=> col(s"_tgt_$k"))
      .reduce(_ && _)
    val joined = cur.join(tgt, joinCond, "full_outer")
    val inTgt = col("_tgt_present").isNotNull
    val inCur = col("_cur_present").isNotNull
    val changed = payload
      .map(c => !(col(s"_cur_$c") <=> col(s"_tgt_$c")))
      .foldLeft(lit(false))(_ || _)
    val op = when(!inCur, lit("I"))
      .when(!inTgt, lit("D"))
      .when(changed, lit("U"))
    val outCols = keyCols.map(k =>
      coalesce(col(s"_tgt_$k"), col(s"_cur_$k")).as(k)) ++
      payload.map(c =>
        when(col("_op") === "D", lit(null)).otherwise(col(s"_tgt_$c"))
          .as(c))
    joined.withColumn("_op", op)
      .filter(col("_op").isNotNull)
      .select(col("_op") +: outCols: _*)
  }
}
