package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Global row rank over an arbitrary total order WITHOUT the
  * single-partition window (curriculum ordering, global top-N cuts,
  * deterministic enumeration).
  *
  * `row_number() OVER (ORDER BY …)` with no PARTITION BY plans as a
  * window over ONE partition — every row moves to one task, the
  * textbook 100 TB single-reducer death (Spark logs the warning
  * itself). This is instead the [[Packing]] two-pass shape applied to
  * COUNTS: range-repartition on the sort key (a distributed sort's
  * shuffle — full parallelism, ~|rows|/partitions per task), sort
  * within partitions, then per-partition row counts (numPartitions
  * longs to the driver) seed a second streaming pass that adds each
  * partition's exclusive offset to its local row index. Both passes
  * share one lineage, so the range shuffle is written once.
  *
  * The rank depends only on the global order, not on where partition
  * boundaries fall, so results are identical for any partition count
  * (asserted in GlobalRankSpec). The sort key must be a TOTAL order —
  * include a unique tiebreaker (an id) or rows equal under the key get
  * an arbitrary (though stable-per-run) rank among themselves.
  */
object GlobalRank {

  /** Append a 0-based `rankCol` ranking every row under `sortExprs`
    * (use `col(...).desc` for descending keys). */
  def rank(df: DataFrame, sortExprs: Seq[Column],
      rankCol: String = "rank", partitions: Int = 0): DataFrame = {
    require(sortExprs.nonEmpty, "GlobalRank: sortExprs must be non-empty")
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    // Dataset.rdd is a lazy val: the count pass and the rank pass share
    // this lineage, so the range shuffle's map files are written once.
    val sorted = df
      .repartitionByRange(n, sortExprs: _*)
      .sortWithinPartitions(sortExprs: _*)
      .rdd
    val counts = sorted
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _) // exclusive prefix
    val bc = spark.sparkContext.broadcast(offsets)
    val ranked = sorted.mapPartitionsWithIndex { (i, it) =>
      var r = bc.value(i)
      it.map { row =>
        val out = Row.fromSeq(row.toSeq :+ r)
        r += 1
        out
      }
    }
    spark.createDataFrame(ranked,
      df.schema.add(rankCol, LongType, nullable = false))
  }

  /** Per-group k-quantile bucket (grouped ntile) WITHOUT per-group
    * window tasks. `ntile() OVER (PARTITION BY g ORDER BY …)` plans
    * one task per group holding the whole group — with 3 groups over
    * 100 TB that is 3 reducers owning everything. Instead: ONE global
    * [[rank]] under (group ++ order) — groups land contiguous in the
    * global order, full range-partition parallelism — then each
    * group's exclusive offset and size come from a |groups|-row
    * aggregate, broadcast back, and the bucket is exact integer
    * arithmetic `((rank − offset) · k) ÷ size` ∈ [0, k). (Bucket
    * boundaries are the floor-of-proportion cut, not SQL ntile's
    * remainder-to-early-buckets cut — document the contract, don't
    * imitate the accident.) Requires `orderCols` to totally order
    * rows within a group (include a unique tiebreaker). */
  def groupedNtile(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[Column], k: Int,
      bucketCol: String = "bucket"): DataFrame = {
    require(k > 0, "GlobalRank.groupedNtile: k must be positive")
    import org.apache.spark.sql.functions._
    val ranked =
      GlobalRank.rank(df, groupCols.map(col) ++ orderCols, "_grank")
    val sizes = ranked.groupBy(groupCols.map(col): _*)
      .agg(min(col("_grank")).as("_goff"), count(lit(1)).as("_gn"))
    ranked.join(broadcast(sizes), groupCols)
      // exact long arithmetic end-to-end: `div` is integer division
      // (Column./ would detour through double)
      .withColumn("_lrk", (col("_grank") - col("_goff")) * lit(k.toLong))
      .withColumn(bucketCol, expr("_lrk div _gn"))
      .drop("_grank", "_goff", "_gn", "_lrk")
  }
}
