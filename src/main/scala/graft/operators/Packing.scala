package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-budget packing — assign documents, in a deterministic global
  * order, to contiguous bins of ~`budget` tokens (LLM training-shard /
  * sequence-packing layout: bin b holds the docs whose running token
  * offset lands in [b·budget, (b+1)·budget)).
  *
  * The naive formulation is a running total over a global ORDER BY —
  * which Spark plans as a WINDOW WITH NO PARTITION: every row moves to
  * ONE task, the textbook 100 TB single-reducer death. This is instead
  * the classic two-pass distributed prefix sum:
  *
  *   1. range-repartition by id and sort within partitions — global
  *      order across partition boundaries, full parallelism;
  *   2. per-partition token totals — a tiny (numPartitions-long) array
  *      collected to the driver and broadcast back as exclusive offsets;
  *   3. one streaming pass per partition adds the local running sum to
  *      the partition's offset. No second shuffle.
  *
  * Both passes run over the SAME RDD lineage, so the range shuffle's
  * map files are written once and re-read — no cache or checkpoint of
  * the data is needed (only the per-partition sums ever reach the
  * driver). Step 3 is genuine per-partition imperative state (a running
  * accumulator with a partition-indexed seed), which is the documented
  * carve-out for dropping to the RDD layer — there is no Catalyst
  * operator for seeded per-partition scans.
  *
  * The bin assignment depends only on the global (id → tokens) order,
  * not on partition boundaries, so results are identical for any
  * partition count — asserted in PackingSpec.
  */
object Packing {

  /** @param idCol  unique orderable id defining the global pack order
    * @param tokCol per-doc token count (non-negative)
    * @return (idCol, tokCol, offset, bin): `offset` = tokens before this
    *         doc, `bin` = offset / budget
    */
  def packByBudget(docs: DataFrame, idCol: String, tokCol: String,
      budget: Long, partitions: Int = 0): DataFrame = {
    require(budget > 0, "packByBudget: budget must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val n = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    // Dataset.rdd is a lazy val: both jobs below share this one lineage,
    // so the range shuffle is computed once and its files re-read.
    val sorted = docs
      .select(col(idCol).cast("long"), col(tokCol).cast("long"))
      .repartitionByRange(n, col(idCol))
      .sortWithinPartitions(idCol)
      .as[(Long, Long)]
      .rdd
    // pass 1: per-partition totals (numPartitions longs to the driver)
    val partSums = sorted
      .mapPartitionsWithIndex((i, it) =>
        Iterator((i, it.foldLeft(0L)(_ + _._2))))
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _) // exclusive prefix
    val bc = spark.sparkContext.broadcast(offsets)
    // pass 2: seeded running sum, no further shuffle
    val packed = sorted.mapPartitionsWithIndex { (i, it) =>
      var cum = bc.value(i)
      it.map { case (id, tok) =>
        val off = cum
        cum += tok
        (id, tok, off, off / budget)
      }
    }
    packed.toDF(idCol, tokCol, "offset", "bin")
  }
}
