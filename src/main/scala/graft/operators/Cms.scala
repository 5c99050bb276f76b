package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a composition of
  * Spark built-ins — approximate per-key counts over an UNBOUNDED key
  * space with bounded state.
  *
  * Shape for 100 TB: the sketch table is `depth × width` cells — a
  * CONSTANT — and building it is one aggregation whose map-side partial
  * combine caps every partition's shuffle contribution at depth·width
  * rows regardless of input size or key cardinality. That is the whole
  * point vs an exact `groupBy(key)`: counting 10¹¹ URLs exactly shuffles
  * 10¹¹ keys; the sketch shuffles ≤ depth·width·partitions cells.
  * Estimation joins the (tiny) sketch to the queried keys —
  * broadcast-sized by construction.
  *
  * Hashing is the repo's engine-portable md5 family
  * ([[graft.functions.TextFunctions.hash60]] shape), so an external SQL
  * oracle replays every cell and estimate bit-for-bit. Estimates carry
  * the standard one-sided guarantee: est ≥ true count, with overshoot
  * bounded by collisions per row (ε ≈ e/width at depth ln(1/δ)).
  *
  * The reference engine has no sketch surface (it is a row replicator —
  * river/sync.go); this extends the KMV-distinct family
  * ([[graft.functions.expr]] KmvSketch) with frequency estimation.
  */
object Cms {

  private def cellOf(j: Column, key: Column, width: Int): Column =
    pmod(conv(substring(md5(concat(j.cast("string"), lit(":"),
      key.cast("string"))), 1, 15), 16, 10).cast("long"), lit(width.toLong))

  /** Build the sketch: one row per non-empty cell, `(j, cell, c)`.
    * Rows explode ×depth before the aggregation, but the map-side
    * combine collapses them to ≤ depth·width per partition. */
  def build(df: DataFrame, keyCol: String, width: Int = 64,
      depth: Int = 3): DataFrame = {
    require(width > 0 && depth > 0,
      s"cms width=$width depth=$depth must be positive")
    df.select(col(keyCol).as("_k"),
        explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .select(col("j"), cellOf(col("j"), col("_k"), width).as("cell"))
      .groupBy(col("j"), col("cell"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point-estimate the queried keys against a built sketch:
    * min over the depth rows of the key's cell counts (0 if a cell is
    * empty). The sketch side is depth×width rows — always broadcast. */
  def estimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
      width: Int = 64, depth: Int = 3): DataFrame = {
    val probes = keys
      .select(col(keyCol), explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .withColumn("cell", cellOf(col("j"), col(keyCol), width))
    probes
      .join(broadcast(sketch), Seq("j", "cell"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }
}
