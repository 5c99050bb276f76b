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
}
