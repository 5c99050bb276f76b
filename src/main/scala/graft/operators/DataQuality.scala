package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit — the contract gate a pipeline runs
  * before promoting a new snapshot or corpus drop: each rule reduces a
  * table to ONE `(rule, n_violations)` row, the audit is their union,
  * and "promote" is `Σ n_violations == 0`. Rules are plain aggregates
  * (map-side combined, one scan per source table regardless of how
  * many same-table rules — Catalyst shares the scan under the union),
  * except the referential check, which is one broadcast-able anti-join
  * per relationship — the minimum any FK check costs. */
object DataQuality {

  private def one(rule: String, n: Column): (DataFrame => DataFrame) =
    df => df.agg(n.cast("long").as("n_violations"))
      .select(lit(rule).as("rule"), col("n_violations"))

  /** Duplicate-key violations: rows beyond the first per key. */
  def uniqueKey(df: DataFrame, rule: String,
      keyCols: Seq[String]): DataFrame =
    one(rule, count(lit(1)) -
      countDistinct(col(keyCols.head), keyCols.tail.map(col): _*))(df)

  /** NULL violations in a required column. */
  def notNull(df: DataFrame, rule: String, c: String): DataFrame =
    one(rule, coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)),
      lit(0L)))(df)

  /** Rows violating an arbitrary row-level contract predicate. */
  def check(df: DataFrame, rule: String, mustHold: Column): DataFrame =
    one(rule, coalesce(sum(when(!mustHold, 1L).otherwise(0L)),
      lit(0L)))(df)

  /** Orphaned child rows: child keys with no parent (anti-join). */
  def foreignKey(child: DataFrame, parent: DataFrame, rule: String,
      childKey: String, parentKey: String): DataFrame = {
    val orphans = child.join(
      parent.select(col(parentKey).as(childKey)).distinct(),
      Seq(childKey), "left_anti")
    one(rule, count(lit(1)))(orphans)
  }

  /** The audit report: one row per rule. */
  def audit(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty, "audit: need at least one check")
    checks.reduce(_ unionByName _)
  }
}
