package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-layout optimization: Z-order (Morton) clustering, the
  * data-skipping move for multi-dimensional scans. Sorting 100 TB by
  * one key gives perfect min/max pruning on that key and NONE on any
  * other; interleaving the key bits gives ~√-width ranges on BOTH
  * dimensions per file, so parquet/Delta-style min-max statistics
  * prune scans filtered on either column (Morton 1966; the layout
  * behind Delta/Iceberg `OPTIMIZE ZORDER BY`).
  *
  * The z-value is a pure scan-local bit-interleave projection
  * (codegen'd shift/and/or chain, no UDF); the layout step is one
  * `repartitionByRange` + `sortWithinPartitions` on it — exactly the
  * shuffle a plain sort-by-key layout already pays. LayoutSpec
  * MEASURES the skipping claim: per-chunk min/max ranges of both
  * dimensions under z-layout vs single-key layout. */
object Layout {

  /** Morton interleave of the low `bits` of `x` and `y` (both must be
    * non-negative): bit i of x lands at 2i, bit i of y at 2i+1. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "zValue: bits must be in [1, 31]")
    val xs = x.cast("long")
    val ys = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** The layout pass: cluster `df` into `partitions` z-ordered chunks
    * (range-partitioned + sorted within, ready to write). */
  def zOrderBy(df: DataFrame, xCol: String, yCol: String, bits: Int,
      partitions: Int): DataFrame = {
    val z = zValue(col(xCol), col(yCol), bits).as("_z")
    df.withColumn("_z", z)
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }

  // ---- min/max skip index over a clustered layout -------------------
  //
  // ClickHouse reads nothing without this: the primary key's sparse
  // index plus `minmax` skip indexes prune granules before the scan.
  // The same stats exist in parquet footers, but only for the sort
  // key's physical order; these operators make the granule stats an
  // explicit, queryable table so ANY clustered key (e.g. a z-value
  // over two dimensions) prunes on BOTH source columns. The stats
  // table is granule-count sized — thousands of rows for 100 TB — so
  // pruning is a driver/broadcast-side operation and the fact scan
  // only ever touches surviving blocks.

  /** Granule id: the clustered key's high bits (`key >> widthBits`) —
    * deterministic, contiguous in key order, power-of-two rows per
    * key-range rather than per-block row counting (which would need a
    * global sort). Key must be non-negative. */
  def blockOf(key: Column, widthBits: Int): Column =
    shiftright(key.cast("long"), widthBits)

  /** Per-block `(block, n_rows, min_c, max_c, …)` stats — one scan,
    * map-side combine collapses each task to its block count before
    * the exchange. */
  def minmaxStats(df: DataFrame, blockCol: String,
      cols: Seq[String]): DataFrame =
    df.groupBy(col(blockCol))
      .agg(count(lit(1)).as("n_rows"),
        cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"),
          max(col(c)).as(s"max_$c"))): _*)

  /** Blocks whose stats ranges overlap EVERY `(col, lo, hi)` range
    * predicate — the candidate set; false positives possible (stats
    * are coarse), false negatives impossible. */
  def pruneBlocks(stats: DataFrame,
      preds: Seq[(String, Column, Column)]): DataFrame =
    preds.foldLeft(stats) { case (df, (c, lo, hi)) =>
      df.filter(col(s"max_$c") >= lo && col(s"min_$c") <= hi)
    }

  /** The skip-index scan: keep only rows in surviving blocks. The
    * block list is granule-count sized → broadcast semi join, so the
    * fact side is never shuffled; callers then apply the exact
    * predicate to strip the stats' false positives. */
  def prunedScan(df: DataFrame, blockCol: String,
      surviving: DataFrame): DataFrame =
    df.join(broadcast(surviving.select(col(blockCol))), Seq(blockCol),
      "left_semi")
}
