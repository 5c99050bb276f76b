package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range-predicate) join — pair left and right rows of the same
  * key whose timestamps fall within a window: `r.ts ∈ (l.ts + lower,
  * l.ts + upper]`. Spark plans a raw inequality predicate as a broadcast
  * nested-loop / cartesian join — O(|l|·|r|) per key and a guaranteed
  * 100 TB failure. This is the standard bucketed rewrite (Flink interval
  * join / DuckDB IEJoin territory): quantize time into buckets of width
  * `upper - lower`, explode each LEFT row to the (at most two) buckets
  * its window can touch, keep the RIGHT side single-bucket, equi-join on
  * (key, bucket), then verify the exact predicate.
  *
  * Cost: one equi-join shuffle on (key, bucket); the left side at most
  * doubles. No cross product ever materializes — candidates are bounded
  * by rows sharing a (key, time-bucket) cell, the same locality a
  * merge-based IEJoin would exploit. The right side carries exactly one
  * bucket, so no post-join dedup is needed.
  */
object RangeJoin {

  /** @param leftTs/rightTs  LONG columns (e.g. epoch micros) — callers
    *                        convert timestamps first; integer bucket math
    *                        keeps the join key exact
    * @param lower/upper     window bounds added to left ts, `lower <
    *                        upper`; match iff `l+lower < r <= l+upper`
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, lower: Long, upper: Long,
      leftPrefix: String = "l_", rightPrefix: String = "r_"): DataFrame = {
    require(upper > lower, s"intervalJoin: upper=$upper must exceed lower=$lower")
    val width = upper - lower
    val keys = keyCols.map(col)
    // floorDiv semantics (negative-safe) in exact integer math: subtract
    // the positive remainder first (pmod is non-negative), then divide
    // with SQL `div` (IntegralDivide) — exact at ALL long magnitudes,
    // including beyond 2^53 where a double `/` would round.
    def fdiv(c: Column): Column =
      call_function("div", c - pmod(c, lit(width)), lit(width))
    val lo = col(leftTs) + lit(lower + 1L) // window is half-open: (lower, upper]
    val hi = col(leftTs) + lit(upper)
    val lSide = left
      .withColumn("_bucket", explode(array_distinct(array(fdiv(lo), fdiv(hi)))))
    val rSide = right.withColumn("_bucket", fdiv(col(rightTs)))
    val lRenamed = lSide.select(
      keys ++ Seq(col("_bucket")) ++
        left.columns.map(c => col(c).as(s"$leftPrefix$c")): _*)
    val rRenamed = rSide.select(
      keys ++ Seq(col("_bucket")) ++
        right.columns.map(c => col(c).as(s"$rightPrefix$c")): _*)
    lRenamed.join(rRenamed, keyCols :+ "_bucket")
      .filter(col(s"$rightPrefix$rightTs") > col(s"$leftPrefix$leftTs") + lit(lower) &&
        col(s"$rightPrefix$rightTs") <= col(s"$leftPrefix$leftTs") + lit(upper))
      .drop("_bucket")
  }
}
