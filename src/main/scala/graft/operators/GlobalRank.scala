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
}
