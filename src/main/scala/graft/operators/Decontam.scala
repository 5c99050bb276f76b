package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Benchmark decontamination — find training documents that overlap an
  * evaluation/benchmark set by shared word n-grams (the standard
  * 13-gram-collision test from the GPT-3/PaLM data cards; `n` is a
  * parameter because real pipelines tune it per tokenizer).
  *
  * Shape for 100 TB: both sides reduce to (id, 60-bit shingle hash)
  * pairs before anything shuffles — document text never leaves the
  * scan. The join is a plain equi-join on the hash (an inverted index,
  * not an all-pairs scan); the benchmark side is tiny in practice and
  * broadcasts, so the common case is one shuffle-free map-side join
  * over the corpus. Counts aggregate on (doc, bench) pairs, bounded by
  * actual collisions, not by the cross product.
  *
  * The reference engine has no text surface (it is a row replicator,
  * see river/sync.go); decontamination is part of the LLM-pipeline
  * extension surface this engine adds on top.
  */
object Decontam {

  /** Per (doc, bench-doc) overlap: distinct shared n-grams, the doc's
    * distinct n-gram count, and their ratio. Only colliding pairs
    * appear — a clean corpus produces an empty frame.
    *
    * @return (doc_id, bench_id, matched, n_ngrams, overlap)
    */
  def overlapPairs(docs: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, benchIdCol: String, benchTextCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"ngram n=$n must be >= 1")
    // the fused native kernel (hashed_shingles: tokens → distinct
    // shingles → 60-bit hashes, one pass) replaces the interpreted
    // shingle transform + per-exploded-row md5 — identical values
    // (hash60 of each distinct n-gram), ~an order less scan CPU
    def hashedSet(text: org.apache.spark.sql.Column) =
      call_function("hashed_shingles", TextFunctions.tokens(text), lit(n))
    val d = docs.select(col(idCol).cast("long").as("doc_id"),
        hashedSet(col(textCol)).as("_hs"))
      .withColumn("n_ngrams", size(col("_hs")).cast("long"))
      .filter(col("n_ngrams") > 0)
      .select(col("doc_id"), col("n_ngrams"), explode(col("_hs")).as("_h"))
    // distinct (bench, hash): duplicate benchmark docs must not double-
    // count a collision
    val b = bench.select(col(benchIdCol).cast("long").as("bench_id"),
        explode(hashedSet(col(benchTextCol))).as("_h"))
      .distinct()
    d.join(b, "_h")
      .groupBy("doc_id", "bench_id", "n_ngrams")
      .agg(count(lit(1)).as("matched"))
      .select(col("doc_id"), col("bench_id"), col("matched"),
        col("n_ngrams"),
        round(col("matched") / col("n_ngrams"), 6).as("overlap"))
  }

  /** Corpus-side contamination verdict: every document, with its worst
    * benchmark overlap and a `contaminated` flag (any bench doc sharing
    * ≥ `minMatched` n-grams, or overlap ≥ `minOverlap`). Docs whose id
    * also appears in the benchmark are not self-matched — pass disjoint
    * id spaces or pre-filter if the sets can alias.
    *
    * @return (doc_id, max_overlap, max_matched, contaminated)
    */
  def flag(docs: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, benchIdCol: String, benchTextCol: String,
      n: Int, minMatched: Long = 1L,
      minOverlap: Double = 1.0): DataFrame = {
    val pairs = overlapPairs(docs, bench, idCol, textCol,
        benchIdCol, benchTextCol, n)
      .filter(col("doc_id") =!= col("bench_id"))
      .groupBy("doc_id")
      .agg(max("overlap").as("max_overlap"),
        max("matched").as("max_matched"))
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(pairs, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("max_overlap"), lit(0.0)).as("max_overlap"),
        coalesce(col("max_matched"), lit(0L)).as("max_matched"),
        (coalesce(col("max_matched"), lit(0L)) >= minMatched ||
          coalesce(col("max_overlap"), lit(0.0)) >= minOverlap)
          .cast("int").as("contaminated"))
  }
}
