package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence mining over the per-key timeline — the first-order
  * (Markov) transition structure of user behavior, the summary every
  * product-analytics "path analysis" view is built from. The reference
  * replicates rows and leaves sequence analysis to ClickHouse query
  * functions (`sequenceMatch` et al.); SURVEY §2 maps no such
  * operator, so this is engine surface (Funnel covers the ORDERED
  * PATTERN match; this is the full transition matrix).
  *
  * Shape (the 100 TB argument): ONE key-partitioned sort window (the
  * data-sized exchange — same cost class as any per-key ordering),
  * then an aggregate whose domain is |event types|², not rows, and a
  * window over THAT tiny frame for the per-source normalization.
  * Nothing after the lag ever moves event-sized data again. */
object Sequence {

  /** Per-key consecutive-event transition counts and probabilities.
    * Ordering is the `(tsCol, tiebreakCol)` TOTAL order, so ties at
    * equal timestamps are deterministic. Each key's first event has
    * no predecessor and feeds no pair; keys never chain into each
    * other. `p` = n / Σ n over the same `prev` — one fixed double
    * division both engines evaluate identically. */
  def transitions(df: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, tiebreakCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tiebreakCol))
    val pairs = df
      .withColumn("prev_type", lag(col(typeCol), 1).over(w))
      .where(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
    val byPrev = Window.partitionBy(col("prev_type"))
    pairs.withColumn("p",
      col("n").cast("double") / sum(col("n")).over(byPrev).cast("double"))
  }

  /** Last-touch attribution: every `conversionType` event joined to
    * the MOST RECENT preceding `touchType` event of the same key (or
    * null if the key never touched before converting).
    *
    * Shape: this is an as-of self-join, but expressed as a running
    * `last(…, ignoreNulls)` over the one key-partitioned sort window
    * — an UNBOUNDED PRECEDING running frame, which Spark evaluates
    * incrementally (state = one row), never re-scanning the frame per
    * row. Same single data-sized exchange as [[transitions]]; the
    * filter to conversions happens after, so output is conversion-
    * sized. A join formulation would shuffle the table twice. */
  def lastTouch(df: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, tiebreakCol: String, touchType: String,
      conversionType: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tiebreakCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("touch",
        last(when(col(typeCol) === touchType,
          struct(col(tsCol).as("touch_ts"),
            col(tiebreakCol).as("touch_id"))), ignoreNulls = true)
          .over(w))
      .where(col(typeCol) === conversionType)
      .select(col(keyCol), col(tiebreakCol).as("conversion_id"),
        col(tsCol).as("conversion_ts"),
        col("touch.touch_id").as("touch_id"),
        col("touch.touch_ts").as("touch_ts"))
  }
}
