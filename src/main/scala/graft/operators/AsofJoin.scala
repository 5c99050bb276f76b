package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — each left row picks ONE right row of the same
  * key: the latest right row at-or-before the left row's timestamp
  * (backward), or the earliest at-or-after (forward). The reference
  * engine has no such operator; time-series state lookup is a standard
  * analytics need (kdb `aj`, DuckDB `ASOF JOIN`, Flink temporal join)
  * and Spark lacks a built-in, so this is the composed-operator form
  * recommended by the build notes: no custom physical plan needed.
  *
  * Implementation is the union-and-running-window trick, NOT a range
  * join: tag right rows 0 and left rows 1, union them, and take
  * `last(payload, ignoreNulls)` over a running window ordered by
  * (ts, tag, tiebreak). One shuffle on the key, one sort — the same
  * cost as a co-partitioned merge join, with no inequality-join
  * explosion (a naive `l.ts >= r.ts` join is O(|l|·|r|) per key and
  * falls off Spark's equi-join fast path entirely).
  *
  * At 100 TB this scales as a single hash-partitioned sort: state per
  * task is one running struct, not the right-side history. A very hot
  * key concentrates its rows in one task (inherent to per-key ordering);
  * for that shape, pre-bucket by coarse time and union the bucket
  * boundaries, or accept the sort — there is no cross-row shuffle
  * amplification here.
  *
  * Tie semantics (deterministic, engine-independent): among right rows
  * sharing (key, ts), the one with the greatest `tiebreak` wins; at
  * equal left/right ts the right row IS visible (at-or-before /
  * at-or-after). No null ordering is relied on — the tiebreak column is
  * coalesced to a constant on the left side.
  */
object AsofJoin {

  /** @param payload  right columns carried to the output (prefixed)
    * @param tiebreak right column ordering rows within an equal (key,ts)
    *                 group — must be non-null on the right side
    * @param forward  false = latest right at-or-before left.ts;
    *                 true = earliest right at-or-after left.ts
    */
  def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      tiebreak: String, prefix: String = "r_",
      forward: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    val keys = keyCols.map(col)
    val rStruct = right.select((payload :+ rightTs).map(col): _*).schema
    val lTagged = left.select(
      keys ++ Seq(
        col(leftTs).as("_ts"), lit(1).as("_tag"), lit(0L).as("_tb"),
        struct(leftCols.map(col): _*).as("_l"),
        lit(null).cast(rStruct).as("_r")): _*)
    val rTagged = right.select(
      keys ++ Seq(
        col(rightTs).as("_ts"), lit(0).as("_tag"),
        col(tiebreak).cast("long").as("_tb"),
        lit(null).cast(lTagged.schema("_l").dataType).as("_l"),
        struct((payload :+ rightTs).map(col): _*).as("_r")): _*)
    // forward = backward on the reversed time axis: flip the ordering
    // and keep "last non-null wins"; the tag still sorts right rows
    // on the visible side of equal-ts left rows.
    val ordering: Seq[Column] =
      if (forward) Seq(col("_ts").desc, col("_tag").asc, col("_tb").asc)
      else Seq(col("_ts").asc, col("_tag").asc, col("_tb").asc)
    val w = Window.partitionBy(keys: _*).orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lTagged.unionByName(rTagged)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
    val outL = leftCols.map(c => col(s"_l.$c").as(c))
    val outR = (payload :+ rightTs).map(c => col(s"_m.$c").as(s"$prefix$c"))
    matched.select(outL ++ outR: _*)
  }
}
