package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-level statistics for training-data pipelines: distribution
  * summaries a 100 TB curation run needs before and after every filter
  * stage (what did the dedup do to the length distribution? how many
  * tokens survive per bucket?).
  *
  * Both operators are deterministic and oracle-replayable — no
  * approx_percentile / random sampling, because the correctness gate
  * hash-compares against an external SQL engine:
  *   - [[boundedQuantiles]] uses the KMV trick (the `k` rows with the
  *     smallest md5-derived id hashes form a uniform-but-deterministic
  *     sample) and then EXACT rank selection inside the bounded sample.
  *   - [[lengthHistogram]] is an exact fixed-width histogram — one
  *     scan-local aggregation, output rows = bucket count.
  *
  * The reference engine has no stats surface (it is a row replicator —
  * river/sync.go); this is part of the LLM-pipeline extension surface.
  */
object CorpusStats {

  /** 60-bit md5 hash of the id — the same engine-portable hash family as
    * [[Sampling.hashBucket]], kept as a raw value so "lowest k" is
    * well-defined. */
  private def idHash(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long")

  /** Deterministic quantiles of a per-document measure over a KMV-style
    * bounded sample.
    *
    * Shape for 100 TB: `orderBy(hash).limit(k)` compiles to
    * TakeOrderedAndProject — each partition keeps its local top-k, the
    * driver merges k rows — so the corpus is scanned once, nothing wide
    * shuffles, and every downstream step (ranking, quantile selection)
    * runs on a ≤k-row frame. The single-partition window below is
    * therefore bounded by construction (same convention as
    * Sampling.trainingOrder's shards-row window).
    *
    * Quantile definition (replayed verbatim by the oracle): with the
    * sample ordered by (value, doc_id), quantile q is the value at rank
    * `ceil(q·n)`, n = sample size.
    *
    * @return one row per requested quantile: (q, value, n_sample)
    */
  def boundedQuantiles(docs: DataFrame, idCol: String, measure: Column,
      quantiles: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9, 0.99),
      k: Int = 256): DataFrame = {
    require(k > 0, s"sample bound k=$k must be positive")
    require(quantiles.nonEmpty && quantiles.forall(q => q > 0 && q <= 1),
      s"quantiles must be in (0, 1]: $quantiles")
    val samp = docs
      .select(col(idCol).cast("long").as("_id"), measure.as("_v"),
        idHash(col(idCol)).as("_h"))
      .orderBy(col("_h"), col("_id")).limit(k)
    val w = Window.orderBy(col("_v"), col("_id")) // ≤k rows: bounded
    val ranked = samp
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(
        Window.partitionBy()))
    val qCol = explode(array(quantiles.map(lit): _*)).as("q")
    ranked.select(col("_v"), col("_rn"), col("_n"), qCol)
      .filter(col("_rn") === ceil(col("q") * col("_n")))
      .select(col("q").cast("double").as("q"),
        col("_v").cast("long").as("value"),
        col("_n").cast("long").as("n_sample"))
  }

  /** Exact fixed-width histogram of a per-document integer measure: one
    * scan-local partial aggregation, one tiny shuffle on ~(max/width)
    * bucket keys. @return (bucket, lo, n_docs, min_v, max_v, sum_v) */
  def lengthHistogram(docs: DataFrame, measure: Column,
      width: Int = 10): DataFrame = {
    require(width > 0, s"bucket width=$width must be positive")
    val v = measure.cast("long")
    docs.select(v.as("_v"))
      .withColumn("bucket", floor(col("_v") / width))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), min("_v").as("min_v"),
        max("_v").as("max_v"), sum("_v").as("sum_v"))
      .select(col("bucket").cast("long").as("bucket"),
        (col("bucket") * width).cast("long").as("lo"),
        col("n_docs"), col("min_v"), col("max_v"), col("sum_v"))
  }

  /** Convenience: whitespace token count, the usual length measure. */
  def tokenMeasure(textCol: Column): Column =
    TextFunctions.tokenCount(textCol).cast("long")

  /** Per-domain score threshold at quantile `p`, from a deterministic
    * KMV-style per-domain sample — the machinery behind
    * [[filterByDomainQuantile]], exposed for reporting.
    *
    * Why RELATIVE thresholds: a single global quality cutoff lets a
    * verbose domain crowd out a terse one (reference-style quality
    * pipelines filter WITHIN each source for exactly this reason — e.g.
    * CCNet's per-language perplexity buckets, Wenzek et al. 2020).
    * The threshold for each domain is the score at rank ⌈p·n⌉ of a
    * deterministic uniform sample of that domain: the `k` docs with the
    * smallest md5 id-hashes ([[Sampling.hashBucket]]'s family), ordered
    * by (score, id).
    *
    * Scale shape: the corpus projects to four narrow columns (domain,
    * id, score, hash) before anything wide happens; the per-domain
    * top-k runs two-level ([[Sampling.reservoirByHash]]'s posture —
    * per-(domain, sub-bucket) rank first, so no one-task-per-domain
    * straggler), and every later step ranks ≤k-row frames. The output
    * is domains-sized.
    *
    * @return (domain, threshold, n_sample)
    */
  def domainThresholds(scored: DataFrame, idCol: String,
      domainCol: String, scoreCol: String, p: Double, k: Int = 128,
      subParts: Int = 32): DataFrame = {
    require(p > 0 && p <= 1, s"quantile p=$p must be in (0, 1]")
    require(k > 0 && subParts > 0, "k and subParts must be positive")
    val h = md5(col(idCol).cast("string"))
    val samp = scored
      .select(col(domainCol).as("domain"), col(idCol).as("_id"),
        col(scoreCol).as("_q"), h.as("_h"),
        Sampling.hashBucket(col(idCol), subParts).as("_sub"))
      .withColumn("_prerank", row_number().over(Window
        .partitionBy(col("domain"), col("_sub"))
        .orderBy(col("_h").asc, col("_id").asc)))
      .filter(col("_prerank") <= k)
      .withColumn("_r", row_number().over(Window.partitionBy(col("domain"))
        .orderBy(col("_h").asc, col("_id").asc)))
      .filter(col("_r") <= k)
    val byScore = Window.partitionBy(col("domain"))
      .orderBy(col("_q").asc, col("_id").asc)
    samp
      .withColumn("_qr", row_number().over(byScore))
      .withColumn("_n",
        count(lit(1)).over(Window.partitionBy(col("domain"))))
      .filter(col("_qr") === ceil(lit(p) * col("_n")))
      .select(col("domain"), col("_q").as("threshold"),
        col("_n").cast("long").as("n_sample"))
  }

  /** Keep documents scoring at or above their OWN domain's `p`-quantile
    * threshold (from [[domainThresholds]]). The thresholds frame is
    * domains-sized, so the join back is a broadcast and the filter is
    * scan-local — the corpus itself never shuffles.
    *
    * @return the kept rows of `docs` plus (score, threshold) columns
    */
  def filterByDomainQuantile(docs: DataFrame, idCol: String,
      domainCol: String, score: Column, p: Double, k: Int = 128,
      subParts: Int = 32): DataFrame = {
    val scored = docs.withColumn("_score", score)
    val thr = domainThresholds(
      scored.select(col(domainCol), col(idCol), col("_score")),
      idCol, domainCol, "_score", p, k, subParts)
    scored
      .join(broadcast(thr.withColumnRenamed("domain", domainCol)),
        Seq(domainCol))
      .filter(col("_score") >= col("threshold"))
  }

  /** Pearson correlation matrix over `measures` (named column
    * expressions), computed from ORDER-INDEPENDENT moments: every
    * per-row term (x, x², x·y) is rounded to DECIMAL(25,12) and summed
    * in exact fixed-point — the [[QualityClassifier]] posture — so the
    * result is bit-identical under any partitioning or engine, and the
    * final double arithmetic (including sqrt, which IEEE 754 requires
    * correctly rounded) replays exactly in external SQL. ONE aggregate
    * job over the corpus: d + d(d+1)/2 + d(d-1)/2 cells shuffle per
    * partition; the driver computes the d(d-1)/2 correlations from
    * those sums.
    *
    * @return (feat_a, feat_b, corr): one row per unordered pair,
    *         lexicographic; corr rounded to 6 places, null when either
    *         variance is zero
    */
  def exactCorr(df: DataFrame,
      measures: Seq[(String, Column)]): DataFrame = {
    require(measures.size >= 2, "exactCorr: need at least two measures")
    val spark = df.sparkSession
    import spark.implicits._
    val dec = org.apache.spark.sql.types.DecimalType(25, 12)
    val names = measures.map(_._1)
    val base = df.select(measures.map { case (n, c) =>
      c.cast("double").as(n)
    }: _*)
    val pairs = for {
      i <- names.indices; j <- i + 1 until names.size
    } yield (i, j)
    val aggs =
      names.map(n => sum(col(n).cast(dec)).as(s"s_$n")) ++
        names.map(n => sum((col(n) * col(n)).cast(dec)).as(s"ss_$n")) ++
        pairs.map { case (i, j) =>
          sum((col(names(i)) * col(names(j))).cast(dec))
            .as(s"sp_${names(i)}_${names(j)}")
        } :+ count(lit(1)).as("n")
    val row = base.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getAs[Long]("n").toDouble
    def d(field: String): Double =
      row.getAs[java.math.BigDecimal](field).doubleValue()
    val out = pairs.map { case (i, j) =>
      val (a, b) = (names(i), names(j))
      val cov = n * d(s"sp_${a}_$b") - d(s"s_$a") * d(s"s_$b")
      val va = n * d(s"ss_$a") - d(s"s_$a") * d(s"s_$a")
      val vb = n * d(s"ss_$b") - d(s"s_$b") * d(s"s_$b")
      val corr: java.lang.Double =
        if (va <= 0.0 || vb <= 0.0) null
        else BigDecimal(cov / (math.sqrt(va) * math.sqrt(vb)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (a, b, corr)
    }
    out.toDF("feat_a", "feat_b", "corr")
  }

  /** Distribution-drift monitor: per-bucket KL-divergence contributions
    * between two corpus slices' hashed-unigram distributions — the
    * "did today's crawl change shape vs yesterday's" check, and the
    * mixture-monitoring twin of [[Dsir]]'s selection model. Output is
    * the `buckets`-bounded table `(bucket, p_cnt, q_cnt, kl_contrib)`
    * with `kl_contrib = p_b · ln(p_b/q_b)` (add-one smoothed, rounded
    * to 9 decimals); `Σ kl_contrib ≥ 0` is KL(p‖q). Per-bucket rows
    * rather than the scalar sum so the result is hash-exact in any
    * engine (each row is a deterministic per-row double chain over
    * exact integer counts; a distributed scalar sum would be
    * FP-order-sensitive). The table is DENSE — all `buckets` rows,
    * absent buckets included: their smoothed contributions are
    * nonzero, and only the dense sum is a true KL (Gibbs ≥ 0; a
    * sparse subset can sum negative). Cost: two map-side-combined
    * B-row aggregates — the corpus never shuffles. */
  def bucketKlDivergence(p: DataFrame, q: DataFrame, textCol: String,
      buckets: Int = 256): DataFrame = {
    val pc = Dsir.bucketCounts(p, textCol, buckets)
      .select(col("bucket"), col("c").as("p_cnt"))
    val qc = Dsir.bucketCounts(q, textCol, buckets)
      .select(col("bucket"), col("c").as("q_cnt"))
    val joined = p.sparkSession.range(buckets)
      .select(col("id").as("bucket"))
      .join(pc, Seq("bucket"), "left").join(qc, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("p_cnt"), lit(0L)).as("p_cnt"),
        coalesce(col("q_cnt"), lit(0L)).as("q_cnt"))
    val totals = joined.agg(sum(col("p_cnt")).as("pt"),
      sum(col("q_cnt")).as("qt"))
    joined.crossJoin(broadcast(totals))
      .select(col("bucket"), col("p_cnt"), col("q_cnt"),
        round(
          ((col("p_cnt") + lit(1)) / (col("pt") + lit(buckets))) *
            log(((col("p_cnt") + lit(1)) / (col("pt") + lit(buckets))) /
              ((col("q_cnt") + lit(1)) / (col("qt") + lit(buckets)))),
          9).as("kl_contrib"))
  }

  /** Per-group Shannon entropy, reported as its per-value
    * contributions `h_contrib = −(c/n)·ln(c/n)` (rounded to 9 dp, the
    * [[bucketKlDivergence]] convention that absorbs last-ulp ln
    * differences between engines) plus the exact counts they derive
    * from — the behavioral-diversity signal ("how spread is this
    * user's event mix"), summable per group by the reader.
    *
    * Shape: the (group, value) aggregate keeps its map-side combine —
    * the exchange carries pair-grain partials, not raw rows (the
    * dominant reduction when values repeat within a group); the
    * group-total window then re-exchanges only the
    * |groups|·|values|-sized aggregate. Two tiny exchanges beat one
    * raw-data-sized exchange whenever values-per-pair > ~2. */
  def groupEntropy(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
    val frac = col("c").cast("double") / col("n").cast("double")
    df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("c"))
      .withColumn("n", sum(col("c")).over(w))
      .select(col(groupCol), col(valueCol), col("c"), col("n"),
        round(-frac * log(frac), 9).as("h_contrib"))
  }
}
