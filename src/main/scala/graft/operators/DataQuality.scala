package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit — the contract gate a pipeline runs
  * before promoting a new snapshot or corpus drop: each rule reduces to
  * ONE `(rule, n_violations)` row, the audit is their union, and
  * "promote" is `Σ n_violations == 0`.
  *
  * Aggregate-style rules (uniqueness, required columns, row contracts)
  * against the SAME table should be passed together to [[auditTable]]:
  * Spark does not share scans across union branches, so one fused
  * aggregate is the difference between 1 scan and rules-many scans of
  * a 100 TB table (plan-audited). Referential checks are one
  * broadcast-able anti-join per relationship — the minimum any FK
  * check costs — and compose with the rest via [[audit]]. */
object DataQuality {

  /** An aggregate-expression rule: `violations` must be an AGGREGATE
    * column counting violating rows. */
  final case class TableRule(name: String, violations: Column)

  /** Duplicate-key rule: rows beyond the first per key. */
  def uniqueKeyRule(name: String, keyCols: Seq[String]): TableRule =
    TableRule(name, count(lit(1)) -
      countDistinct(col(keyCols.head), keyCols.tail.map(col): _*))

  /** Required-column rule: NULLs in `c`. */
  def notNullRule(name: String, c: String): TableRule =
    TableRule(name, sum(when(col(c).isNull, 1L).otherwise(0L)))

  /** Row-contract rule: rows where `mustHold` is false. Rows where it
    * evaluates NULL do not count — pair with [[notNullRule]] when NULL
    * itself is a violation. */
  def checkRule(name: String, mustHold: Column): TableRule =
    TableRule(name, sum(when(!mustHold, 1L).otherwise(0L)))

  /** All of a table's aggregate rules in ONE scan: a single aggregate
    * node computes every rule's count, then unpivots to
    * `(rule, n_violations)` rows. (With a uniqueness rule present the
    * plan pays the usual count-distinct Expand — still one scan.) */
  def auditTable(df: DataFrame, rules: Seq[TableRule]): DataFrame = {
    require(rules.nonEmpty, "auditTable: need at least one rule")
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      coalesce(r.violations.cast("long"), lit(0L)).as(s"_v$i")
    }
    val entries = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), col(s"_v$i").as("n_violations"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(entries: _*)).as("_r")).select(col("_r.*"))
  }

  /** Single-rule conveniences (each one scan — prefer [[auditTable]]
    * to batch rules against the same table). */
  def uniqueKey(df: DataFrame, rule: String,
      keyCols: Seq[String]): DataFrame =
    auditTable(df, Seq(uniqueKeyRule(rule, keyCols)))

  def notNull(df: DataFrame, rule: String, c: String): DataFrame =
    auditTable(df, Seq(notNullRule(rule, c)))

  def check(df: DataFrame, rule: String, mustHold: Column): DataFrame =
    auditTable(df, Seq(checkRule(rule, mustHold)))

  /** Orphaned child rows: child keys with no parent (anti-join). */
  def foreignKey(child: DataFrame, parent: DataFrame, rule: String,
      childKey: String, parentKey: String): DataFrame = {
    val orphans = child.join(
      parent.select(col(parentKey).as(childKey)).distinct(),
      Seq(childKey), "left_anti")
    orphans.agg(count(lit(1)).cast("long").as("n_violations"))
      .select(lit(rule).as("rule"), col("n_violations"))
  }

  /** The audit report: one row per rule. */
  def audit(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty, "audit: need at least one check")
    checks.reduce(_ unionByName _)
  }
}
