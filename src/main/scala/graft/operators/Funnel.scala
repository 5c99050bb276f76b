package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Time-boxed funnel — ClickHouse's `windowFunnel(window)`: a
    * group's depth is the length of the longest in-order stage chain
    * whose events ALL fall within `window` of the chain's own stage-1
    * anchor. Every stage-1 event is a candidate anchor; for a fixed
    * anchor the greedy "earliest next stage" extension is optimal
    * (taking the earliest stage-i event can only leave more room for
    * stage i+1), so max-over-anchors of the greedy chain is the exact
    * sliding-window depth, not an earliest-anchor approximation.
    *
    * Returns `(depth, n_groups)` — how many groups topped out at each
    * depth 1..stages.length (groups with no stage-1 event don't
    * appear, matching windowFunnel = 0 being dropped).
    *
    * Shape: per level one hash join on the group key plus one
    * aggregate back to anchor grain — events are never self-joined
    * row-to-row, and the anchor frame only shrinks level to level.
    * All milestones are `min(ts)` over exact timestamps, so the result
    * is insertion-order independent and replayable. */
  def windowed(events: DataFrame, groupCol: String, typeCol: String,
      tsCol: String, stages: Seq[String], window: Column): DataFrame = {
    require(stages.size >= 2, "windowed: need at least two stages")
    val spark = events.sparkSession
    import spark.implicits._
    // distinct anchors: two stage-1 events at the same instant are one
    // chain start
    val anchors = events.filter(col(typeCol) === stages.head)
      .select(col(groupCol).as("_g"), col(tsCol).as("_t1"))
      .distinct()
      .withColumn("_tmax", col("_t1") + window)
    var reached = anchors.withColumn("_t", col("_t1"))
    var depths: DataFrame = anchors.select(col("_g"), col("_t1"))
      .withColumn("_depth", lit(1))
    stages.zipWithIndex.drop(1).foreach { case (stage, i) =>
      reached = events.filter(col(typeCol) === stage)
        .select(col(groupCol).as("_g"), col(tsCol).as("_ts"))
        .join(reached, "_g")
        .filter(col("_ts") > col("_t") && col("_ts") <= col("_tmax"))
        .groupBy(col("_g"), col("_t1"), col("_tmax"))
        .agg(min(col("_ts")).as("_t"))
      depths = depths.unionByName(
        reached.select(col("_g"), col("_t1"))
          .withColumn("_depth", lit(i + 1)))
    }
    depths.groupBy(col("_g"))
      .agg(max(col("_depth")).as("depth"))
      .groupBy(col("depth"))
      .agg(count(lit(1)).as("n_groups"))
  }
}
