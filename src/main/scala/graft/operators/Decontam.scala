package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Bloom-filter bit positions of a 60-bit shingle hash `h`: classic
    * double hashing `pos_j = (h1 + j·h2) mod m` with `h1 = h mod 2³⁰`,
    * `h2 = 2·(h div 2³⁰) + 1` (odd, so the probe sequence covers a
    * power-of-two `m`). Pure integer arithmetic on the engine-portable
    * [[TextFunctions.hash60]] value — an external SQL engine replays
    * every position bit-for-bit. */
  def bloomPos(h: Column, j: Int, mBits: Int): Column =
    pmod(pmod(h, lit(1L << 30)) +
      lit(j.toLong) * (shiftright(h, 30) * lit(2L) + lit(1L)),
      lit(mBits.toLong))

  /** Build the Bloom bitmask from `bench`'s n-grams (ONE bounded
    * collect — ≤ `mBits` distinct positions regardless of benchmark
    * size) and return the scan-local counter: hashed-shingle array →
    * how many shingles have all `k` probe bits set. The returned
    * function is a pure projection over a broadcast literal, so it
    * drops into ANY plan — batch scans and Structured Streaming
    * micro-batches alike (no join, no state). */
  def bloomMatchCount(bench: DataFrame, benchTextCol: String, n: Int,
      mBits: Int, k: Int): Column => Column = {
    require(n >= 1, s"ngram n=$n must be >= 1")
    require(mBits > 0 && (mBits & (mBits - 1)) == 0,
      s"mBits=$mBits must be a positive power of two")
    require(k >= 1, s"bloom k=$k must be >= 1")
    val positions = bench
      .select(explode(call_function("hashed_shingles",
        TextFunctions.tokens(col(benchTextCol)), lit(n))).as("_h"))
      .select(explode(array((0 until k).map(j =>
        bloomPos(col("_h"), j, mBits)): _*)).as("pos"))
      .distinct()
      .collect().map(_.getLong(0))
    val words = new Array[Long](mBits / 64)
    positions.foreach(p => words((p >> 6).toInt) |= (1L << (p & 63)))
    val mask = typedLit(words.toSeq)
    // bit test per position, all-k conjunction per shingle — evaluated
    // inside the scan projection (k bit probes per shingle; the HOF is
    // interpreted but the work per element is trivial)
    def bitSet(pos: Column) =
      call_function("shiftright",
        element_at(mask, (shiftright(pos, 6) + lit(1L)).cast("int")),
        pmod(pos, lit(64L)).cast("int")).bitwiseAND(lit(1L)) === lit(1L)
    def bloomHit(h: Column) =
      (0 until k).map(j => bitSet(bloomPos(h, j, mBits)))
        .reduce(_ && _)
    hs => size(filter(hs, h => bloomHit(h))).cast("long")
  }

  /** Bloom-filter contamination flag — the bounded-memory variant of
    * [[flag]] for benchmark sets too large to join exactly: the
    * benchmark's n-gram hashes fold into an `mBits`-bit Bloom filter
    * (`k` probes per n-gram), and every corpus document counts its
    * shingles whose k positions are ALL set. One-sided by
    * construction: `bloom_matched ≥ exact_matched` for every document
    * (no false negatives; false positives bounded by the standard
    * `(1-e^{-kn/m})^k`). Both counts are emitted so the guarantee is
    * visible in the output.
    *
    * Shape for 100 TB: the filter is built from one bounded collect —
    * the benchmark side reduces to ≤ `mBits` DISTINCT positions
    * (65,536 default = an 8 KB bitmask) regardless of benchmark size —
    * and ships to every task as a literal array; the corpus-side
    * membership test runs entirely inside the scan projection (no
    * explode, no join, no shuffle for the bloom path). The exact
    * companion count reuses the [[overlapPairs]] inverted-index join
    * on the benchmark's distinct hashes. Unlike [[flag]] there is no
    * per-pair identity, so benchmark members ARE self-matched — filter
    * the benchmark ids out downstream if the id spaces alias.
    *
    * @return (doc_id, n_ngrams, bloom_matched, exact_matched,
    *         contaminated)
    */
  def flagBloom(docs: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, benchTextCol: String, n: Int,
      mBits: Int = 1 << 16, k: Int = 3,
      minMatched: Long = 1L, minOverlap: Double = 1.0): DataFrame = {
    def hashedSet(text: Column) =
      call_function("hashed_shingles", TextFunctions.tokens(text), lit(n))
    val matched = bloomMatchCount(bench, benchTextCol, n, mBits, k)
    val scored = docs.select(col(idCol).cast("long").as("doc_id"),
        hashedSet(col(textCol)).as("_hs"))
      .select(col("doc_id"), size(col("_hs")).cast("long").as("n_ngrams"),
        matched(col("_hs")).as("bloom_matched"),
        explode_outer(col("_hs")).as("_h"))
    // exact companion: inverted-index join on the benchmark's distinct
    // hashes (the [[overlapPairs]] posture without the pair identity)
    val benchHashes = bench
      .select(explode(hashedSet(col(benchTextCol))).as("_h")).distinct()
      .withColumn("_bench", lit(1))
    scored.join(broadcast(benchHashes), Seq("_h"), "left")
      .groupBy("doc_id", "n_ngrams", "bloom_matched")
      .agg(count(col("_bench")).as("exact_matched"))
      .select(col("doc_id"), col("n_ngrams"), col("bloom_matched"),
        col("exact_matched"),
        (col("bloom_matched") >= minMatched ||
          (col("n_ngrams") > 0 &&
            col("bloom_matched") / col("n_ngrams") >= minOverlap))
          .cast("int").as("contaminated"))
  }

  /** EMBEDDING-space decontamination: flag corpus vectors whose cosine
    * against any benchmark vector clears `threshold` — the semantic
    * contamination an n-gram test misses outright (a paraphrased or
    * translated eval item shares no 13-gram with its source but sits
    * next to it in embedding space; cf. the embedding-dedup rationale
    * in SemDeDup, Abbas et al. 2023, applied contamination-wise).
    *
    * Shape for 100 TB: the bench side is small by definition and
    * BROADCASTS; the corpus side is a scan-local nested loop over that
    * broadcast (|bench| fused-kernel cosines per corpus row) feeding a
    * partial max — no shuffle ever carries a corpus vector, and the
    * output is one verdict row per corpus vector. For bench sets too
    * large to broadcast, pre-filter with [[Similarity.lshCosinePairs]]
    * and verify the survivors — same verdict, candidate-bounded cost.
    *
    * Self-pairs (a bench vector that is itself in the corpus frame)
    * are excluded by id, so bench members report their similarity to
    * the REST of the bench, not a trivial 1.0.
    *
    * @return (idCol, max_sim, contaminated) — max_sim rounded to 4
    */
  def flagEmbed(corpus: DataFrame, bench: DataFrame, idCol: String,
      vecCol: String, benchIdCol: String, benchVecCol: String,
      threshold: Double): DataFrame = {
    val c = corpus.select(col(idCol),
      col(vecCol).cast("array<double>").as("_v"))
    val b = bench.select(col(benchIdCol).as("_bid"),
      col(benchVecCol).cast("array<double>").as("_bv"))
    c.crossJoin(broadcast(b))
      .filter(col(idCol) =!= col("_bid"))
      .groupBy(idCol)
      .agg(max(round(Similarity.cosineNative(col("_v"), col("_bv")), 4))
        .as("max_sim"))
      .select(col(idCol), col("max_sim"),
        (col("max_sim") >= threshold).cast("int").as("contaminated"))
  }
}
