package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation — ABSENT from the reference (its
  * pipeline is processing-time only, SURVEY §2.9) but first-class engine
  * surface: tumbling, sliding, and session windows over an event-time
  * column, with watermark-bounded state when streaming.
  *
  * The same builders serve batch (the oracle-checked path) and streaming
  * (`withWatermark` added) — Spark's `window`/`session_window` functions
  * are identical in both modes, so batch results ARE the streaming
  * results modulo late-data policy.
  *
  * Scale: windowed aggregation shuffles on (window, keys); watermarks cap
  * state for unbounded streams. Sliding windows multiply each event into
  * `length/slide` panes — keep the ratio small or pre-aggregate to the
  * slide granularity first (the classic panes optimization).
  */
object EventTimeWindows {

  /** Tumbling window aggregation. */
  def tumbling(df: DataFrame, tsCol: String, width: String,
      keys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(col(tsCol), width) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("win_start", col("window.start"))
      .drop("window")

  /** Sliding window aggregation (each event lands in length/slide
    * panes). */
  def sliding(df: DataFrame, tsCol: String, width: String, slide: String,
      keys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(col(tsCol), width, slide) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("win_start", col("window.start"))
      .drop("window")

  /** Session windows: events within `gap` of each other merge into one
    * session per key; the window ends `gap` after the last event. */
  def sessions(df: DataFrame, tsCol: String, gap: String,
      keys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupBy(session_window(col(tsCol), gap) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("win_start", col("session_window.start"))
      .drop("session_window")

  /** Streaming variant: watermark bounds both state retention and the
    * late-data cutoff (events older than max(event time) − `delay` are
    * dropped — the policy the reference simply lacks). */
  def tumblingStream(stream: DataFrame, tsCol: String, width: String,
      delay: String, keys: Seq[String], aggs: Seq[Column]): DataFrame =
    tumbling(stream.withWatermark(tsCol, delay), tsCol, width, keys, aggs)

  def sessionsStream(stream: DataFrame, tsCol: String, gap: String,
      delay: String, keys: Seq[String], aggs: Seq[Column]): DataFrame =
    sessions(stream.withWatermark(tsCol, delay), tsCol, gap, keys, aggs)
}
