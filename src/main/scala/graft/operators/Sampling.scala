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

  /** The hash input for a salted permutation: `id` for the empty salt
    * (bit-compatible with every pre-salt assignment and oracle),
    * `id:salt` otherwise. Multi-epoch training wants a DIFFERENT
    * reproducible permutation per epoch — same rows, decorrelated
    * order — so the salt (e.g. the epoch number) folds into the md5
    * input, never into runtime randomness. */
  private def saltedId(id: Column, salt: String): Column =
    if (salt.isEmpty) id.cast("string")
    else concat(id.cast("string"), lit(":" + salt))

  /** Stratified deterministic sample: per-stratum Bernoulli-by-hash
    * rates (e.g. downsample web text, keep all books). Same scan-local
    * zero-shuffle shape as [[sampleByHash]] — the stratum column picks
    * the threshold row-by-row; unlisted strata fall back to
    * `defaultFraction`. Thresholds are exact bucket counts, so the
    * assignment replays identically in any engine with md5. */
  def stratifiedSampleByHash(df: DataFrame, idCol: String,
      strataCol: String, fractions: Seq[(String, Double)],
      defaultFraction: Double = 0.0, buckets: Int = 1000000): DataFrame = {
    require(fractions.forall { case (_, f) => f >= 0 && f <= 1 },
      "stratifiedSampleByHash: fractions must be in [0,1]")
    require(defaultFraction >= 0 && defaultFraction <= 1,
      "stratifiedSampleByHash: defaultFraction must be in [0,1]")
    val thr = fractions.foldRight(
        lit(math.round(defaultFraction * buckets))) {
      case ((name, f), rest) =>
        when(col(strataCol) === name,
          lit(math.round(f * buckets))).otherwise(rest)
    }
    df.filter(hashBucket(col(idCol), buckets) < thr)
  }

  /** Exact deterministic "reservoir" of `k` rows per stratum: the k
    * rows whose id-hash ranks smallest within the stratum — a uniform,
    * reproducible choice (a true randomized reservoir is neither
    * re-runnable nor engine-replayable).
    *
    * A naive per-stratum rank is a window partitioned by stratum — one
    * task per stratum, the usual skew death when one stratum holds half
    * the corpus. Instead: two-level top-k. Rows first rank within
    * (stratum, hash-sub-bucket) — `subParts`-way parallel per stratum —
    * and only each sub-bucket's top k (≤ subParts·k rows per stratum, a
    * few thousand) reach the per-stratum final rank. The global top-k
    * is exactly the top-k of the union of per-bucket top-ks, so the
    * result is identical to the naive window, row for row.
    *
    * @return input rows + `sample_rank` (1..k within the stratum)
    */
  def reservoirByHash(df: DataFrame, idCol: String, strataCol: String,
      k: Int, subParts: Int = 32): DataFrame = {
    require(k > 0, "reservoirByHash: k must be positive")
    import org.apache.spark.sql.expressions.Window
    val h = md5(col(idCol).cast("string"))
    val pre = Window
      .partitionBy(col(strataCol), hashBucket(col(idCol), subParts))
      .orderBy(h.asc, col(idCol).asc)
    val fin = Window.partitionBy(col(strataCol))
      .orderBy(h.asc, col(idCol).asc)
    df.withColumn("_prerank", row_number().over(pre))
      .filter(col("_prerank") <= k)
      .withColumn("sample_rank", row_number().over(fin))
      .filter(col("sample_rank") <= k)
      .drop("_prerank")
  }

  /** Deterministic weighted Bernoulli sample: per-row keep probability
    * `min(1, rate × weight)`, driven by the id hash — quality-weighted
    * corpus sampling (keep more of what scores higher) that replays
    * identically on every run and engine. The threshold is
    * `floor(rate × weight × buckets)` (floor, not round: banker's vs
    * half-up rounding would diverge across engines), so the oracle
    * reproduces the exact kept set. Scan-local filter, zero shuffle. */
  def weightedSampleByHash(df: DataFrame, idCol: String,
      weight: Column, rate: Double, buckets: Int = 1000000): DataFrame = {
    require(rate >= 0, "weightedSampleByHash: rate must be >= 0")
    df.filter(hashBucket(col(idCol), buckets) <
      least(lit(buckets.toLong),
        floor(weight * rate * buckets).cast("long")))
  }

  /** Temperature-flattened domain mixture sample: keep-rates are DERIVED
    * from the observed domain sizes so the kept corpus follows the
    * temperature-α distribution `q(d) ∝ n_d^α` (α < 1 flattens — the
    * multilingual/domain rebalancing rule where head domains are
    * downsampled and tail domains kept whole) at overall target fraction
    * `targetFrac`. Per-domain keep-rate
    * `min(1, N·targetFrac·n_d^α / Z / n_d)` with `Z = Σ n_d^α`; rows
    * are then kept by the same floor-threshold id-hash rule as
    * [[weightedSampleByHash]], so the exact kept set replays on every
    * run and engine (the multiply/divide chain is written in one fixed
    * left-to-right order for bit-identical oracle replay).
    *
    * Scale shape: one domains-sized count aggregate, rates computed on
    * that tiny frame, broadcast back, scan-local filter — the corpus
    * itself never shuffles. */
  /** Per-domain temperature rate table `(domainCol, _rate)` with
    * `_rate = N·mult·n_d^α / Z / n_d`, `Z = Σ n_d^α` — the ONE copy of
    * the FP-order-sensitive chain both mixture variants (and their
    * DuckDB oracles) must replay term-for-term.
    *
    * The domains-sized count table (the mixture contract: domains ≪
    * corpus) is collected ONCE, sorted by domain, and `Z`/`N` are
    * summed on the driver in that fixed left-to-right order — a
    * parallel engine sum's accumulation order depends on partitioning,
    * and a last-ulp difference in `Z` could flip a row at a
    * `floor(rate×buckets)` threshold boundary (ADVICE r9). The oracle
    * replays the same order via `sum(… ORDER BY domain)`. One corpus
    * scan, no cache, and the per-term chain
    * (`N·mult·pow(n,α)/Z/n`, left to right) uses the same IEEE ops
    * Spark's `pow`/`*`/`/` would (`java.lang.Math.pow`, binary64). */
  private def domainRates(df: DataFrame, domainCol: String,
      alpha: Double, mult: Double): DataFrame = {
    val spark = df.sparkSession
    // engine-side ORDER BY so the sort collation matches the oracle's
    // for any domain column type; then a strict sequential fold
    val counts = df.groupBy(col(domainCol))
      .agg(count(lit(1)).cast("double").as("_n"))
      .orderBy(col(domainCol))
      .collect()
    var z = 0.0
    var nn = 0.0
    counts.foreach { r =>
      z += math.pow(r.getDouble(1), alpha)
      nn += r.getDouble(1)
    }
    val rates: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(counts.map { r =>
        val n = r.getDouble(1)
        org.apache.spark.sql.Row(r.get(0),
          nn * mult * math.pow(n, alpha) / z / n)
      }: _*)
    spark.createDataFrame(rates, org.apache.spark.sql.types.StructType(Seq(
      df.schema(domainCol).copy(nullable = true),
      org.apache.spark.sql.types.StructField("_rate",
        org.apache.spark.sql.types.DoubleType))))
  }

  def temperatureSampleByHash(df: DataFrame, idCol: String,
      domainCol: String, alpha: Double, targetFrac: Double,
      buckets: Int = 1000000): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    require(targetFrac > 0 && targetFrac <= 1, "targetFrac must be in (0, 1]")
    val thresholds = domainRates(df, domainCol, alpha, targetFrac)
      .select(col(domainCol),
        floor(least(lit(1.0), col("_rate")) * buckets)
          .cast("long").as("_thresh"))
    df.join(broadcast(thresholds), domainCol)
      .filter(hashBucket(col(idCol), buckets) < col("_thresh"))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Temperature mixture with UPSAMPLING: like
    * [[temperatureSampleByHash]] but a domain whose target share
    * exceeds its size is REPEATED instead of capped — the
    * epochs-per-domain primitive of data mixing (tail domains cycle
    * more than once per training epoch). Each row gets
    * `floor(rate_d)` copies plus one more when its id hash lands under
    * the fractional part's floor threshold, so expected domain volume
    * is exactly `rate_d · n_d` and the exact copy set replays on every
    * engine. Output = input columns + `rep_idx` (1..copies); rows in
    * domains with `rate_d < 1` and a losing hash draw drop out.
    * `targetMult` scales total output vs input (1.0 ≈ corpus-sized,
    * rebalanced). Same scale shape as the downsampling variant: tiny
    * count agg + broadcast + scan-local explode, no corpus shuffle.
    *
    * `maxRepeats` caps the per-row copy count (the per-row `sequence`
    * materializes `rep` elements before exploding — a near-singleton
    * domain in a huge corpus would otherwise demand an unbounded
    * array); the DuckDB oracle mirrors the cap term-for-term. */
  def temperatureUpsampleByHash(df: DataFrame, idCol: String,
      domainCol: String, alpha: Double, targetMult: Double,
      buckets: Int = 1000000, maxRepeats: Int = 10000): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    require(targetMult > 0, "targetMult must be positive")
    require(maxRepeats > 0, "maxRepeats must be positive")
    val rates = domainRates(df, domainCol, alpha, targetMult)
      .select(col(domainCol),
        least(col("_rate"), lit(maxRepeats.toDouble)).as("_rate"))
      .select(col(domainCol),
        floor(col("_rate")).cast("long").as("_base"),
        floor((col("_rate") - floor(col("_rate"))) * buckets)
          .cast("long").as("_fthresh"))
    val rep = col("_base") +
      when(hashBucket(col(idCol), buckets) < col("_fthresh"), 1L)
        .otherwise(0L)
    df.join(broadcast(rates), domainCol)
      .withColumn("_rep", rep)
      .withColumn("rep_idx",
        explode(when(col("_rep") >= 1, sequence(lit(1L), col("_rep")))
          .otherwise(array().cast("array<long>"))))
      .select((df.columns.map(col) :+ col("rep_idx")).toIndexedSeq: _*)
  }

  /** Deterministic global training order: every row gets `(shard, pos,
    * global_pos)` where `shard` is the id-hash bucket, `pos` ranks the
    * id hash within the shard, and `global_pos` (1-based, contiguous)
    * concatenates the shards — a reproducible pseudo-random permutation
    * of the corpus, the "shuffle the training data" primitive.
    *
    * Scale shape: a single global `row_number` would rank on ONE
    * reducer; here the rank window partitions by shard (pick shards ≈
    * cluster parallelism; each in-shard sort is disk-backed), and the
    * shard offsets come from a `shards`-row aggregate — the same
    * two-level prefix-sum trick as Packing, never a global sort of the
    * data. Hash order is uncorrelated with any source ordering, so the
    * permutation is as good as a random shuffle for training, while
    * identical across runs, retries, and engines.
    *
    * `salt` (e.g. the epoch number) yields a DIFFERENT reproducible
    * permutation over the same rows — it feeds both the shard
    * assignment and the in-shard rank, so epoch 2 is a fresh global
    * shuffle, not a within-shard reshuffle of epoch 1's layout. Empty
    * salt = the unsalted permutation (oracle-compatible). */
  def trainingOrder(df: DataFrame, idCol: String,
      shards: Int, salt: String = ""): DataFrame = {
    require(shards > 0, "trainingOrder: shards must be positive")
    import org.apache.spark.sql.expressions.Window
    val sid = saltedId(col(idCol), salt)
    val h = md5(sid)
    val w = Window.partitionBy(col("shard")).orderBy(h.asc, col(idCol).asc)
    val ranked = df
      .withColumn("shard", hashBucket(sid, shards))
      .withColumn("pos", row_number().over(w).cast("long"))
    // shard offsets: a `shards`-row frame — the unpartitioned window is
    // bounded by the shard count, never data-sized
    val offW = Window.orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranked.groupBy("shard").agg(count(lit(1)).as("_n"))
      .withColumn("_off", coalesce(sum(col("_n")).over(offW), lit(0L)))
      .select(col("shard"), col("_off"))
    ranked.join(broadcast(offsets), "shard")
      .withColumn("global_pos", col("_off") + col("pos"))
      .drop("_off")
  }

  /** Write `df` as `shards` self-contained training shards under
    * `outDir/shard=K/`, each shard one file, rows ordered by id hash
    * within the shard (a stable pseudo-random order). One hash-partition
    * shuffle; file count is exactly `shards`, so size the count to the
    * data (e.g. total_bytes / 512 MB), not to the task count. */
  def writeShards(df: DataFrame, idCol: String, shards: Int,
      outDir: String, salt: String = ""): Unit = {
    // sort ON (shard, hash, id) — not hash alone: the partitioned file
    // writer REQUIRES ordering by the partition column, and if the
    // incoming order doesn't already satisfy it Spark inserts its own
    // (unstable) sort, which would scramble the in-shard hash order the
    // whole point of this writer is to persist. Leading with `shard`
    // satisfies the writer's requirement (the prefix survives the
    // `_horder` projection), so rows land in files exactly in
    // [[trainingOrder]]'s (md5, id) rank order.
    df.withColumn("shard", hashBucket(saltedId(col(idCol), salt), shards))
      .withColumn("_horder", md5(saltedId(col(idCol), salt)))
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col("_horder"), col(idCol))
      .drop("_horder")
      .write.partitionBy("shard").mode("overwrite").parquet(outDir)
  }
}
