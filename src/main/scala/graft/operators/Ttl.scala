package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ClickHouse-style TTL expiry as a batch operator.
  *
  * The sink tables the reference creates (`ReplacingMergeTree ORDER BY
  * pk`, README.md:161) age without bound — MySQL history lands row by
  * row and nothing ever leaves. ClickHouse's answer is the table-level
  * `TTL` clause: plain `TTL ts + INTERVAL n` drops expired rows at
  * merge time, and `TTL … GROUP BY k SET agg` *rolls them up* instead,
  * keeping a coarse aggregate where the raw rows used to be. These
  * operators are those semantics as Spark plans over the synced table,
  * so retention runs as a deterministic batch rewrite rather than a
  * background merge.
  *
  * Scale shape: `expire` is a pure filter — on a date-partitioned
  * layout it prunes whole partitions and rewrites only the boundary
  * one (the plan's PartitionFilters carry the cutoff). `rollupExpired`
  * scans once: the expired side is a hash aggregate at the rollup
  * grain (map-side partial combine does most of the folding before the
  * one exchange), the live side passes through untouched, and the
  * union is plan-level only — no second read of the input. */
object Ttl {

  /** Plain `TTL`: rows with `tsCol` strictly before `cutoff` are
    * dropped. Exposed for symmetry and for the partition-pruning plan
    * it produces on partitioned layouts. */
  def expire(df: DataFrame, tsCol: String, cutoff: Column): DataFrame =
    df.filter(col(tsCol) >= cutoff)

  /** `TTL … GROUP BY keys SET aggs`: expired rows (ts < cutoff)
    * collapse to one row per `keys` value carrying the aggregates;
    * live rows pass through at full grain. The output unions both
    * sides on the shared schema: pass-through columns the rollup can't
    * carry are null on rolled rows, and aggregate columns hold the
    * single-row value on live rows (count 1, max = the value itself) —
    * exactly how the engine's rolled parts and fresh parts coexist in
    * one table.
    *
    * `keys` and `liveCols` are (name, expr) pairs; each agg is
    * (name, aggregate expr, single-row live expr) — e.g.
    * `("n", count(*), lit(1L))`, `("v_max", max(v), v)`. Every
    * aggregate here must be exact (counts, min/max, integer sums) so
    * the rewrite is bit-stable under replay — a retention job that
    * produces different bytes on retry defeats idempotent re-runs. */
  def rollupExpired(df: DataFrame, tsCol: String, cutoff: Column,
      keys: Seq[(String, Column)], aggs: Seq[(String, Column, Column)],
      liveCols: Seq[(String, Column)]): DataFrame = {
    require(keys.nonEmpty && aggs.nonEmpty, "rollupExpired: keys and aggs")
    val liveTypes = liveCols.map { case (n, c) =>
      n -> df.select(c.as(n)).schema.head.dataType }
    val expired = df.filter(col(tsCol) < cutoff)
      .groupBy(keys.map { case (n, c) => c.as(n) }: _*)
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c, _) => c.as(n) }: _*)
      .select(
        keys.map { case (n, _) => col(n) } ++
          liveTypes.map { case (n, dt) => lit(null).cast(dt).as(n) } ++
          aggs.map { case (n, _, _) => col(n) } :+
          lit(true).as("rolled"): _*)
    val live = df.filter(col(tsCol) >= cutoff)
      .select(
        keys.map { case (n, c) => c.as(n) } ++
          liveCols.map { case (n, c) => c.as(n) } ++
          aggs.map { case (n, _, lv) => lv.as(n) } :+
          lit(false).as("rolled"): _*)
    expired.unionByName(live)
  }
}
