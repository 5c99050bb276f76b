package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

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

  /** Stream-stream join: rows match when keys agree AND the right
    * event lands within [left.ts, left.ts + within]. Watermarks on both
    * sides let Spark discard buffered rows once they can no longer
    * match.
    *
    * `joinType = "leftOuter"` adds watermark-DRIVEN null emission: an
    * unmatched left row is released (right columns null) only once the
    * watermark proves no future right row can land in its window —
    * i.e. passes `leftTs + within + delay`. The outer result is thus a
    * function of watermark progression, not just the data: a row whose
    * window hasn't provably closed when the stream ends is withheld,
    * which is why the gated query drives the final watermark past the
    * real timeline with sentinel runs before reading the output. */
  def streamStreamInterval(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      within: String, delay: String,
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, delay).as("l")
    val r = right.withWatermark(rightTs, delay).as("r")
    val keyCond = keys.map(k => col(s"l.$k") === col(s"r.$k"))
      .reduce(_ && _)
    val timeCond = col(s"r.$rightTs") >= col(s"l.$leftTs") &&
      col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $within")
    l.join(r, keyCond && timeCond, joinType)
  }

  /** Streaming as-of enrich — "enrich each click with the user's latest
    * profile version at click time": every micro-batch as-of joins its
    * rows against the history frame using
    * [[graft.operators.AsofJoin.asof]]'s union+running-window trick,
    * which composes per batch unchanged because a left row's match
    * depends only on the right-side history, never on other left rows —
    * so the result is independent of batch boundaries (spec-asserted:
    * any split == one batch == the batch operator).
    *
    * `history` is re-invoked at every batch, like [[streamStatic]]'s
    * re-read dimension: an append-only version log or a CDC-merged
    * store (e.g. `BucketedState.currentView`) is picked up live. The
    * stream itself holds NO state — history is storage-resident, which
    * is what keeps this shape viable at 100 TB (Spark's stateful
    * stream-stream join would buffer the full history in the state
    * store). For hot keys pass `bucketWidth` to run the pre-split
    * [[graft.operators.AsofJoin.asofBucketed]] variant per batch.
    *
    * Returns the configured writer; caller adds checkpoint/trigger and
    * starts — same contract as the CDC pipeline's foreachBatch sinks.
    */
  def streamAsofEnrich(stream: DataFrame, history: () => DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      payload: Seq[String], tiebreak: String, prefix: String = "r_",
      bucketWidth: Option[Long] = None)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    import graft.operators.AsofJoin
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      val h = history()
      val enriched = bucketWidth match {
        case Some(w) => AsofJoin.asofBucketed(batch, h, keys, leftTs,
          rightTs, payload, tiebreak, prefix, forward = false, w)
        case None => AsofJoin.asof(batch, h, keys, leftTs, rightTs,
          payload, tiebreak, prefix)
      }
      sink(enriched, id)
    }
  }
}
