package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169): score raw-corpus documents by how much their
  * hashed-n-gram feature distribution looks like a small TARGET corpus
  * (e.g. "select web pages that look like Wikipedia"), then keep the
  * target-like slice. The standard pretraining-data curation move when
  * you have a quality exemplar set but no labels.
  *
  * Scale/determinism design (the two usually fight; here they align):
  *
  *   - Features are md5 hash buckets of whitespace unigrams
  *     ([[Sampling.hashBucket]] — 60-bit md5, engine-portable), so the
  *     bucket-count "bag of words" model is bounded at `buckets` rows
  *     no matter the corpus size, and a DuckDB oracle replays the
  *     bucket assignment exactly.
  *   - The per-bucket log-likelihood-ratio scores are computed from
  *     EXACT integer counts and quantized to integer micro-nats
  *     (`floor(1e6·llr)` — floor, not round: round's half-up vs
  *     half-away conventions differ across engines, floor doesn't).
  *     A document's weight is then an exact INTEGER sum of its tokens'
  *     bucket scores — identical in any summation order, on any
  *     engine, at any partitioning. No FP-accumulation-order caveat
  *     anywhere in the pipeline.
  *   - Scoring is scan-local: the dense `buckets`-long score array
  *     travels as a literal (one bounded driver-side collect of the
  *     two B-row count tables, the repo's kmeansCentroids convention)
  *     and each doc folds its own token list against it. The corpus
  *     never shuffles; the only exchanges are two B-key count
  *     aggregates with map-side combine. At 100 TB: two cheap
  *     aggregate passes + one scan.
  */
object Dsir {

  /** Feature id of one token: uniform md5 bucket in [0, buckets). */
  def bucket(tok: Column, buckets: Int): Column =
    Sampling.hashBucket(tok, buckets)

  /** `(bucket, c)` unigram-bucket counts of a corpus — a `buckets`-row
    * aggregate (map-side combined; token rows never leave their scan
    * partition un-reduced). */
  def bucketCounts(docs: DataFrame, textCol: String,
      buckets: Int): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("_t"))
      .groupBy(bucket(col("_t"), buckets).as("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Dense integer score table, driver-side (`buckets` longs — bounded,
    * independent of corpus size):
    *
    * `score(b) = floor(1e6 · (ln((tc_b+1)/(Tt+B)) − ln((rc_b+1)/(Tr+B))))`
    *
    * i.e. the add-one-smoothed log-likelihood ratio of drawing feature
    * `b` from the target vs the raw unigram distribution, in micro-nats.
    * Positive ⇒ the feature is more characteristic of the target. */
  def scoreArray(target: DataFrame, raw: DataFrame, textCol: String,
      buckets: Int): Array[Long] = {
    def counts(df: DataFrame): Map[Long, Long] =
      bucketCounts(df, textCol, buckets).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    scoresFromCounts(counts(target), counts(raw), buckets)
  }

  /** [[scoreArray]] for the common in-pipeline shape where the TARGET
    * is a flagged slice of the raw corpus itself (e.g. "target = the
    * English docs of the survivor set"): ONE tokenize+aggregate pass
    * computes both count tables — target counts are a conditional
    * count inside the same aggregate — halving the corpus scans (and
    * collects) the two-frame path pays. Bit-identical scores: the
    * conditional count over `flag` equals the separate count over
    * `raw.filter(flag)` (null flags count as false, matching filter
    * semantics). */
  def scoreArrayByFlag(raw: DataFrame, targetFlag: Column,
      textCol: String, buckets: Int): Array[Long] = {
    val rows = raw
      .select(targetFlag.as("_f"),
        explode(TextFunctions.tokens(col(textCol))).as("_t"))
      .groupBy(bucket(col("_t"), buckets).as("bucket"))
      .agg(count(lit(1)).as("rc"),
        count(when(col("_f"), lit(1))).as("tc"))
      .collect()
    scoresFromCounts(
      rows.map(r => r.getLong(0) -> r.getLong(2)).toMap,
      rows.map(r => r.getLong(0) -> r.getLong(1)).toMap, buckets)
  }

  private def scoresFromCounts(tc: Map[Long, Long], rc: Map[Long, Long],
      buckets: Int): Array[Long] = {
    val tt = tc.values.sum.toDouble + buckets
    val tr = rc.values.sum.toDouble + buckets
    Array.tabulate(buckets) { b =>
      val t = tc.getOrElse(b.toLong, 0L) + 1.0
      val r = rc.getOrElse(b.toLong, 0L) + 1.0
      math.floor(1e6 * (math.log(t / tt) - math.log(r / tr))).toLong
    }
  }

  /** `(id, n_tokens, dsir_weight)` for every corpus row — scan-local:
    * fold the doc's tokens against the literal score array. Integer
    * adds only; empty docs score 0. */
  def scoreDocs(corpus: DataFrame, idCol: String, textCol: String,
      scores: Array[Long], buckets: Int): DataFrame = {
    val arr = lit(scores)
    val toks = TextFunctions.tokens(col(textCol))
    corpus.withColumn("n_tokens", size(toks))
      .withColumn("dsir_weight",
        aggregate(
          transform(toks,
            t => element_at(arr, (bucket(t, buckets) + lit(1)).cast("int"))),
          lit(0L), (acc, x) => acc + x))
  }

  /** End-to-end scoring: train the bucket model (target vs raw), score
    * every raw doc. Keeps all columns of `raw` plus
    * `n_tokens`/`dsir_weight`. */
  def score(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 256): DataFrame =
    scoreDocs(raw, idCol, textCol,
      scoreArray(target, raw, textCol, buckets), buckets)

  /** The selection step: keep docs whose MEAN per-token score is
    * positive (more target-like than raw-like). Length-normalizing
    * stops long documents from dominating on raw magnitude; the mean
    * is compared in exact integer space
    * (`floor(weight/n_tokens) ≥ minMeanMicroNats` — floor of a
    * double quotient of two exact integers, which both engines
    * compute identically since |weight| ≪ 2^53 and n_tokens ≥ 1
    * keeps the quotient > 1 ulp away from integer boundaries). */
  def select(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 256,
      minMeanMicroNats: Long = 0L): DataFrame = {
    val scored = score(raw, target, idCol, textCol, buckets)
    scored.filter(col("n_tokens") > 0 &&
      floor(col("dsir_weight").cast("double") / col("n_tokens"))
        .cast("long") >= lit(minMeanMicroNats))
  }

  /** [[select]] with the target expressed as a flag over the raw
    * corpus ([[scoreArrayByFlag]]'s one-pass model training). */
  def selectByFlag(raw: DataFrame, targetFlag: Column, idCol: String,
      textCol: String, buckets: Int = 256,
      minMeanMicroNats: Long = 0L): DataFrame = {
    val scored = scoreDocs(raw, idCol, textCol,
      scoreArrayByFlag(raw, targetFlag, textCol, buckets), buckets)
    scored.filter(col("n_tokens") > 0 &&
      floor(col("dsir_weight").cast("double") / col("n_tokens"))
        .cast("long") >= lit(minMeanMicroNats))
  }
}
