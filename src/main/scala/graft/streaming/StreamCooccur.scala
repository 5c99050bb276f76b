package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Incremental co-occurrence mining over a continuous event stream —
  * the streaming face of [[graft.operators.Cooccurrence]]: per-group
  * state is the distinct item SET (bounded by the item vocabulary,
  * never by stream length), and each micro-batch emits exactly the NEW
  * pairs its fresh items create against the set so far.
  *
  * The semantics are ORDER-INSENSITIVE by construction: sets are
  * monotone, so batching, arrival order, and duplicate re-delivery
  * cannot change the union of emitted pairs — each (group, a, b) pair
  * is emitted exactly once, in whichever batch completes it, and a
  * replayed batch emits nothing (its items are already in state).
  * That is why this operator needs NO watermark and carries no
  * late-data policy: there is nothing late data could corrupt.
  * Aggregating the emitted deltas by (a, b) reproduces the batch
  * [[graft.operators.Cooccurrence.pairCounts]] exactly (the
  * stream_cooccur gate feeds split + duplicated batches and
  * hash-matches the batch oracle). */
object StreamCooccur {

  /** One emitted co-occurrence: group `g` now contains both `a` and
    * `b` (`a < b`). */
  final case class PairDelta(g: Long, a: String, b: String)

  /** Per-micro-batch new-pair deltas for a STREAMING frame with
    * `groupCol` (integral) and `itemCol` (string) columns. */
  def pairDeltas(events: DataFrame, groupCol: String,
      itemCol: String): Dataset[PairDelta] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(groupCol).cast("long").as("g"),
        col(itemCol).cast("string").as("i"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (g: Long, rows: Iterator[(Long, String)],
            state: GroupState[Set[String]]) =>
          val old = state.getOption.getOrElse(Set.empty[String])
          val fresh = (rows.map(_._2).toSet -- old).toSeq.sorted
          if (fresh.nonEmpty) state.update(old ++ fresh)
          val crossOld = for (n <- fresh; o <- old)
            yield if (n < o) PairDelta(g, n, o) else PairDelta(g, o, n)
          val within = for {
            i <- fresh.indices
            j <- (i + 1) until fresh.size
          } yield PairDelta(g, fresh(i), fresh(j))
          (crossOld ++ within).iterator
      }
  }
}
