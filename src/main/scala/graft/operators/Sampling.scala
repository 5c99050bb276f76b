package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling, split, and shard assignment by content hash —
  * the reproducibility backbone of a training-data pipeline. `rand()`
  * samples are not stable across retries, partitionings, or engines;
  * hashing the record id is: the same row lands in the same
  * split/shard/sample on every run of every engine, new rows never move
  * old rows between splits, and a DuckDB oracle can replay the exact
  * assignment (md5 is md5 everywhere).
  *
  * All of it is a scan-local projection/filter — no shuffle, pushdown
  * and codegen-friendly, trivially 100 TB-safe. `writeShards` adds the
  * one hash-partition shuffle that shard layout inherently needs.
  */
object Sampling {

  /** Uniform bucket in [0, buckets): top 60 md5 bits of the id's string
    * form, mod buckets. 60 bits keeps the hex→long conversion exact. */
  def hashBucket(id: Column, buckets: Int): Column = {
    require(buckets > 0, "hashBucket: buckets must be positive")
    pmod(conv(substring(md5(id.cast("string")), 1, 15), 16, 10)
      .cast("long"), lit(buckets.toLong))
  }

  /** Deterministic Bernoulli-by-hash sample of ~`fraction` of rows. */
  def sampleByHash(df: DataFrame, idCol: String, fraction: Double,
      buckets: Int = 1000000): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0,1]")
    df.filter(hashBucket(col(idCol), buckets) <
      lit(math.round(fraction * buckets)))
  }

  /** Disjoint named splits with integer weights (e.g. train 8 / eval 1 /
    * test 1): a `split` label column driven by the id hash. Weights are
    * exact bucket counts out of `sum(weights)` — no float thresholds. */
  def hashSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "hashSplit: weights must be positive")
    val total = splits.map(_._2).sum
    val bucket = hashBucket(col(idCol), total)
    val bounds = splits.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    val label = splits.zip(bounds).foldRight(lit(null).cast("string")) {
      case (((name, _), hi), rest) => when(bucket < hi, name).otherwise(rest)
    }
    df.withColumn("split", label)
  }

  /** Stable shard id in [0, shards) — the deterministic stand-in for a
    * random training-data shuffle: hash order is uncorrelated with any
    * source ordering, yet reproducible. */
  def shardId(id: Column, shards: Int): Column = hashBucket(id, shards)

  /** Write `df` as `shards` self-contained training shards under
    * `outDir/shard=K/`, each shard one file, rows ordered by id hash
    * within the shard (a stable pseudo-random order). One hash-partition
    * shuffle; file count is exactly `shards`, so size the count to the
    * data (e.g. total_bytes / 512 MB), not to the task count. */
  def writeShards(df: DataFrame, idCol: String, shards: Int,
      outDir: String): Unit = {
    df.withColumn("shard", shardId(col(idCol), shards))
      .withColumn("_horder", md5(col(idCol).cast("string")))
      .repartition(shards, col("shard"))
      .sortWithinPartitions("_horder")
      .drop("_horder")
      .write.partitionBy("shard").mode("overwrite").parquet(outDir)
  }
}
