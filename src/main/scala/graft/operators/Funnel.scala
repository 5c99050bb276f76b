package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis: how many groups (users) reach each stage of
  * an event sequence IN ORDER — stage i counts only if it happens
  * strictly after the group's earliest completion of stage i−1 (the
  * windowFunnel of event analytics).
  *
  * Shape: one filtered aggregate per stage keyed on the group; each
  * later stage joins the events against the previous groups-sized
  * milestone frame on the group key (AQE broadcasts it when it fits,
  * else both sides share the group-hash exchange) — the event table
  * is scanned once per stage and never self-joined row-to-row.
  * Earliest-completion semantics make the result order-independent
  * and exactly replayable: `min(ts)` is an exact aggregate, and
  * "strictly after" chains those minima. */
object Funnel {

  /** `(stage, stage_idx, n_groups)` for the ordered `stages` event
    * types: n_groups reaching stage 1 ≥ stage 2 ≥ … (monotone by
    * construction). */
  def ordered(events: DataFrame, groupCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "ordered: need at least one stage")
    val spark = events.sparkSession
    // stage 1: earliest occurrence per group
    var reached = events.filter(col(typeCol) === stages.head)
      .groupBy(col(groupCol)).agg(min(col(tsCol)).as("_t"))
    var out = Seq((stages.head, 1, reached.count()))
    stages.zipWithIndex.drop(1).foreach { case (stage, i) =>
      reached = events.filter(col(typeCol) === stage)
        .join(reached, groupCol)
        .filter(col(tsCol) > col("_t"))
        .groupBy(col(groupCol)).agg(min(col(tsCol)).as("_t"))
      out :+= ((stage, i + 1, reached.count()))
    }
    import spark.implicits._
    out.toDF("stage", "stage_idx", "n_groups")
  }
}
