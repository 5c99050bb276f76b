package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ClickHouse-style sign-collapse over a CDC insert stream.
  *
  * The reference syncs MySQL mutations into ClickHouse tables it
  * auto-creates as `ReplacingMergeTree ORDER BY pk` (README.md:161)
  * and applies updates/deletes as one `ALTER TABLE … UPDATE/DELETE`
  * mutation per row (clickhouse/client.go:240-343). The other
  * canonical ClickHouse modeling of the same feed — the one its
  * documentation steers syncers toward because ALTER mutations don't
  * scale — is `CollapsingMergeTree(sign)` /
  * `VersionedCollapsingMergeTree(sign, version)`: every update is an
  * insert of a `-1` "cancel" copy of the old row plus a `+1` new
  * state, every delete a lone cancel, and the engine folds matched
  * pairs away at merge time. A user querying such a sink writes
  * `FINAL` (or `GROUP BY key HAVING sum(sign) > 0`); this operator is
  * that read-side collapse as a Spark plan, so the same query runs on
  * the raw sign stream without a ClickHouse merge cycle.
  *
  * Shape: ONE hash exchange on the sorting key. Both the visibility
  * aggregate (`sum(sign)`) and the survivor pick (latest state row by
  * sequence) are window functions over the same key partition, so
  * Catalyst plans a single Exchange and sorts once; no self-join, no
  * second scan. At 100 TB the stream collapses shard-local after the
  * one shuffle — the same posture as the engine's own merge, which is
  * why this modeling beats per-row mutations at scale. */
object Collapse {

  /** `CollapsingMergeTree(sign)` FINAL: for each sorting key, the row
    * stream carries `+1` state inserts and `-1` cancels (each cancel an
    * exact copy of the state it voids, per the engine's contract). A
    * key is visible iff its net sign is positive; the visible row is
    * its latest (max `seqCol`) state row. Keys whose states were all
    * cancelled — net ≤ 0 — vanish, which is how deletes ride an
    * insert-only sink. Output keeps the input columns minus `signCol`
    * and `seqCol`. */
  def collapse(df: DataFrame, keyCols: Seq[String], signCol: String,
      seqCol: String): DataFrame = {
    require(keyCols.nonEmpty, "collapse: need at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*)
    val wOrd = w.orderBy(
      when(col(signCol) === 1, lit(1)).otherwise(lit(0)).desc,
      col(seqCol).desc)
    df.withColumn("_net", sum(col(signCol)).over(w))
      .withColumn("_rn", row_number().over(wOrd))
      .filter(col("_net") > 0 && col("_rn") === 1 && col(signCol) === 1)
      .drop("_net", "_rn", signCol, seqCol)
  }

  /** `SummingMergeTree(sumCols)` FINAL: rows sharing the sorting key
    * merge by SUMMING the measure columns; a merged row whose measures
    * are ALL zero is dropped entirely (the engine's documented
    * zero-elimination — how "retract by inserting the negation" rides
    * an insert-only sink). Non-key non-measure columns get "any value
    * from the merged set" in ClickHouse; here the pick is pinned to
    * `min` so the result is replayable. Callers pre-cast float
    * measures to DECIMAL — the sums must be exact for the zero test
    * (and the oracle hash) to be order-independent.
    *
    * Shape: ONE hash aggregate on the sorting key with map-side
    * partials — no window, no sort. At 100 TB this is the cheapest
    * exchange in the family: the combiner collapses dense keys before
    * the shuffle, exactly like the engine's own part merge. */
  def summing(df: DataFrame, keyCols: Seq[String], sumCols: Seq[String],
      otherCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "summing: need at least one key column")
    require(sumCols.nonEmpty, "summing: need at least one measure")
    val aggs = sumCols.map(c => sum(col(c)).as(c)) ++
      otherCols.map(c => min(col(c)).as(c))
    df.groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .filter(!sumCols.map(c => col(c) === lit(0)).reduce(_ && _))
  }

  /** `VersionedCollapsingMergeTree(sign, version)` FINAL: cancels pair
    * up with states of the SAME (key, version) — out-of-order
    * delivery can't mis-cancel a newer state, the property the
    * versioned engine exists for. A (key, version) survives iff its
    * net sign is positive; the key's visible row is its highest
    * surviving version. One key-partitioned exchange: the per-version
    * net is a window over (key, version), the survivor pick a window
    * over key alone — same hash family, one shuffle. */
  def collapseVersioned(df: DataFrame, keyCols: Seq[String],
      versionCol: String, signCol: String): DataFrame = {
    require(keyCols.nonEmpty, "collapseVersioned: need a key column")
    val wv = Window.partitionBy((keyCols :+ versionCol).map(col): _*)
    val wk = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc)
    // hash(key) clusters (key, version) too, so BOTH windows reuse this
    // one exchange; planned naturally, the (key, version) window would
    // hash on the pair and force a second shuffle for the key window
    df.repartition(keyCols.map(col): _*)
      .withColumn("_net", sum(col(signCol)).over(wv))
      .filter(col("_net") > 0 && col(signCol) === 1)
      .withColumn("_rn", row_number().over(wk))
      .filter(col("_rn") === 1)
      .drop("_net", "_rn", signCol)
  }
}
