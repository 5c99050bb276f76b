package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming joins — engine surface the reference lacks entirely (its
  * only correlation is the sink-side `WHERE pk = ?`, SURVEY §2.3), but
  * table stakes for an event pipeline: enrich a change stream against a
  * dimension, or correlate two event streams in time.
  *
  * - Stream-static: per micro-batch hash/broadcast join against the
  *   (periodically re-read) dimension — no state, no watermark needed.
  * - Stream-stream: both sides buffered in state; the watermark plus an
  *   event-time range predicate bound how long a row waits for its
  *   match, which is what makes state finite at 100 TB (without the
  *   range condition Spark must keep every row forever).
  */
object StreamJoins {

  /** Enrich a stream against a static dimension (broadcast per batch). */
  def streamStatic(stream: DataFrame, dim: DataFrame,
      keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys)

  /** Inner stream-stream join: rows match when keys agree AND the right
    * event lands within [left.ts, left.ts + within]. Watermarks on both
    * sides let Spark discard buffered rows once they can no longer
    * match. */
  def streamStreamInterval(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      within: String, delay: String): DataFrame = {
    val l = left.withWatermark(leftTs, delay).as("l")
    val r = right.withWatermark(rightTs, delay).as("r")
    val keyCond = keys.map(k => col(s"l.$k") === col(s"r.$k"))
      .reduce(_ && _)
    val timeCond = col(s"r.$rightTs") >= col(s"l.$leftTs") &&
      col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $within")
    l.join(r, keyCond && timeCond)
  }
}
