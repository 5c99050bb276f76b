package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-trained bigram language-model scoring — the "perplexity
  * filter" stage of a CCNet-style training-data pipeline: train a
  * smoothed bigram model on the corpus itself, score every document by
  * its mean bigram log-probability, and let downstream passes drop the
  * low-likelihood tail (boilerplate, garbled extractions, wrong-language
  * residue score low; fluent text scores high).
  *
  * Model: add-k smoothed conditional
  * `P(w2 | w1) = (c(w1,w2) + k) / (c(w1,·) + k·V)` where `c(w1,·)` sums
  * bigram counts with left token `w1` and `V` counts distinct right
  * tokens. A document's score is the mean of `ln P` over its bigrams —
  * length-normalized, so long and short docs are comparable (mean
  * negative log-likelihood = log-perplexity, negated).
  *
  * Scale shape: bigram extraction is a scan-local array transform (no
  * per-token explode of the raw text until after tokenization); the
  * model is vocab²-bounded (two tiny aggregates over the bigram-type
  * table, never the corpus); scoring is ONE shuffle join of the
  * exploded bigrams against the per-type log-prob table plus the
  * per-doc aggregate. The bigram extraction runs twice (model pass +
  * scoring pass) — recomputing a projection beats caching a 100 TB
  * intermediate.
  */
object LangModel {

  /** Exploded `(id, w1, w2)` bigram rows of each document's whitespace
    * tokens; docs with fewer than two tokens contribute none. */
  def bigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val pairs = when(size(toks) < 2,
        array().cast("array<struct<w1:string,w2:string>>"))
      .otherwise(transform(sequence(lit(1), size(toks) - 1),
        i => struct(element_at(toks, i).as("w1"),
          element_at(toks, i + lit(1)).as("w2"))))
    docs.select(col(idCol), explode(pairs).as("_bg"))
      .select(col(idCol), col("_bg.w1"), col("_bg.w2"))
  }

  /** Per-bigram-type smoothed log-probability table
    * `(w1, w2, lp = ln((c + k) / (cl + k·V)))` trained on `docs` —
    * vocab²-bounded, broadcast-joinable for any real vocabulary. */
  def bigramModel(docs: DataFrame, idCol: String, textCol: String,
      k: Double = 0.5): DataFrame = {
    val bg = bigrams(docs, idCol, textCol)
    // persist the TYPE table, not corpus data: lc and vs both derive
    // from bc, and Spark cannot reuse its exchange across the three
    // branches — uncached, each branch re-runs the corpus-sized
    // extraction (plan-audited: 3 extra full scans). bc is
    // vocab²-bounded, so the cache is model-sized everywhere. The
    // returned model is EAGERLY materialized (localCheckpoint — an
    // observed-types-sized result), which truncates its lineage so bc
    // can be unpersisted here instead of leaking cached blocks into
    // whatever the session runs next (repo convention, see
    // SparkEntry.dedupClusters).
    val bc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c")).persist()
    try {
      val lc = bc.groupBy("w1").agg(sum(col("c")).as("cl"))
      val v = bc.agg(countDistinct(col("w2")).cast("double").as("vs"))
      bc.join(lc, "w1").crossJoin(broadcast(v))
        .select(col("w1"), col("w2"),
          log((col("c") + lit(k)) / (col("cl") + lit(k) * col("vs")))
            .as("lp"))
        .localCheckpoint()
    } finally bc.unpersist(false)
  }

  /** Score every document against the corpus-trained model:
    * `(id, n_bigrams, lm_score)` where `lm_score` is the mean bigram
    * log-probability (rounded to 6 decimals — the sum order across
    * partitions is engine-specific at the last ulp). Docs with fewer
    * than two tokens have no bigrams and are absent.
    *
    * The model side is broadcast: it is bounded by the OBSERVED bigram
    * types, which for natural text is ≪ vocab² (Zipf — most of the mass
    * sits in few types). For an open-vocab corpus where the type table
    * outgrows broadcast, join [[bigrams]] against [[bigramModel]] with
    * a plain shuffle join instead — the shape stays one join + one
    * per-doc aggregate either way. */
  def score(docs: DataFrame, idCol: String, textCol: String,
      k: Double = 0.5): DataFrame =
    bigrams(docs, idCol, textCol)
      .join(broadcast(bigramModel(docs, idCol, textCol, k)),
        Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("lp")), 6).as("lm_score"))
}
