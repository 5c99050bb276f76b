package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines, built
  * entirely from codegen'd Catalyst built-ins (no UDFs): tokenization,
  * shingling, hashing, fingerprinting, language ID and quality scoring.
  *
  * The reference engine has no text surface (it is a row replicator); these
  * are the engine-level extensions a 100 TB document pipeline needs. Every
  * transform is a pure `Column => Column` so it fuses into whole-stage
  * codegen and runs embarrassingly parallel — no shuffle, no state.
  */
object TextFunctions {

  /** Whitespace tokens of a document; empty/blank text → empty array
    * (a bare `split` would yield `[""]`). */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: alpha runs, digit runs, and single other
    * non-space chars each count as one token — the usual pre-tokenizer
    * regex shape. ~chars/4 heuristics are worse; this is cheap and exact. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Distinct word n-gram shingles ("a b c" strings) over the token
    * array; documents shorter than n tokens → empty array. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(toks) - lit(n)),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j + 1))): _*))))
  }

  /** 60-bit hash of a string: first 15 hex chars of md5, as a positive
    * long. md5 (not Spark's xxhash64/murmur) so an external SQL engine can
    * reproduce the value bit-for-bit — the correctness oracle depends on
    * engine-portable hashing. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Seeded 60-bit hash family: h_i(x) = hash60(i ++ ":" ++ x). */
  def hash60Seeded(seed: Int, c: Column): Column =
    hash60(concat(lit(s"$seed:"), c))

  /** Content fingerprint: md5 of whitespace-normalized, lowercased text —
    * the exact-dedup key. */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** Polynomial rolling hash over the characters (base 31, mod 1e9+7) —
    * an order-sensitive fingerprint that, unlike md5, can be computed
    * incrementally over a stream of chunks. */
  def rollingHash(text: Column): Column =
    aggregate(
      transform(split(text, ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31 + x) % 1000000007L)

  /** English stopword list used by the language-ID heuristic and quality
    * score. Deliberately tiny: the point is the ratio plumbing. */
  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")

  /** Fraction of tokens that are English stopwords (0.0 for empty docs). */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val hits = size(filter(toks, t => t.isin(EnglishStopwords: _*)))
    when(size(toks) === 0, lit(0.0)).otherwise(hits / size(toks))
  }

  /** N-gram-free language-ID heuristic: stopword-profile scoring. Real
    * pipelines plug per-language char-n-gram profiles into the same shape;
    * the classification contract (argmax profile score with an 'und'
    * floor) is what matters here. */
  def langId(text: Column): Column =
    when(stopwordRatio(text) >= 0.02, lit("en")).otherwise(lit("und"))

  /** Top character trigrams per language — Cavnar & Trenkle-style n-gram
    * profiles (hand-curated from the well-known public frequency tables;
    * trigrams include word-boundary spaces, which carry most of the
    * signal). Alphabetical language order = deterministic tie priority. */
  val LangTrigramProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("en ", "er ", "ch ", " de", "der", "ein", "sch", "ich",
      "nde", "die", " di", "und", " un", "che", "ung", "gen", "das",
      " da", "ten", "ine", "ie ", " ge", "nd ", "ng ", "den", "ber",
      "ver", " ve", "ent", "ers", "ste", " au", "auf", "ige", "and",
      " ei", "ser", "hen", "eit", "cht"),
    "en" -> Seq(" th", "the", "he ", " an", "and", "nd ", " of", "of ",
      " in", "ing", "ng ", " to", "to ", "er ", "at ", "en ", "es ",
      "ed ", " co", "ion", "on ", "re ", "tio", " re", "ent", "ati",
      " fo", "for", "her", "ter", "hat", "tha", "ere", "ate", "his",
      " wi", "wit", "ith", " be", "ver"),
    "es" -> Seq(" de", "de ", "os ", " la", "la ", " el", "el ", "as ",
      "ión", "es ", "ent", "en ", " en", "nte", " co", "con", "est",
      " es", "ado", " qu", "que", "ue ", "los", " lo", "ara", " pa",
      "par", "del", "cio", "ión", "aci", "ien", "and", "ar ", "una",
      " un", "por", " po", "res", "sta"),
    "fr" -> Seq("es ", " de", "de ", "ent", "le ", "nt ", "la ", " le",
      "ion", "on ", "re ", " pa", "e l", "e d", " la", "ait", "que",
      " qu", "ue ", "ans", " da", "dan", "our", "ur ", "les", "ne ",
      "eur", " po", "pou", "tio", "ati", "men", " et", "et ", "ons",
      "ous", " co", "con", "ait", "une"))

  /** All character trigrams of the whitespace-normalized, lowercased
    * text (empty below 3 chars). */
  def charTrigrams(text: Column): Column = {
    val norm = lower(regexp_replace(trim(text), "\\s+", " "))
    when(length(norm) < 3, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(norm) - 2),
        i => substr(norm, i, lit(3))))
  }

  /** Character-n-gram language ID: score(lang) = fraction of the text's
    * trigrams found in the language's profile; argmax with an 'und'
    * floor, ties resolved by profile order (alphabetical). Pure column
    * math — scan-bound, no shuffle — and exactly SQL-replicable (the
    * scores are exact small rationals, so cross-engine comparisons are
    * bit-stable). */
  def langIdNgram(text: Column, minScore: Double = 0.05): Column =
    langIdFromScores(langNgramScores(charTrigrams(text)), minScore)

  /** Per-language profile scores from a trigram column. Callers doing
    * this at scale should materialize `tris` as a column FIRST (one
    * charTrigrams pass) and these scores as columns SECOND — inlined,
    * the argmax chain duplicates every subtree (interpreted HOFs =
    * duplicated CPU). Membership is a literal-MAP lookup, not a
    * 40-element array scan per trigram. */
  def langNgramScores(tris: Column): Seq[(String, Column)] =
    LangTrigramProfiles.map { case (l, p) =>
      val profile = typedlit(p.map(_ -> true).toMap)
      l -> (when(size(tris) === 0, lit(0.0)).otherwise(
        size(filter(tris, t => element_at(profile, t).isNotNull))
          .cast("double") / size(tris)))
    }

  /** Argmax with the 'und' floor over (language, score) pairs — pass
    * score COLUMNS (attribute refs) so the chain duplicates references,
    * not computation. Ties resolve by profile order (alphabetical). */
  def langIdFromScores(scores: Seq[(String, Column)],
      minScore: Double = 0.05): Column = {
    val maxScore = scores.map(_._2).reduce(greatest(_, _))
    scores.foldLeft(when(maxScore < minScore, lit("und"))) {
      case (chain, (l, s)) => chain.when(s === maxScore, lit(l))
    }.otherwise(lit("und"))
  }

  /** Ratio of alphabetic chars to all chars (0.0 for empty). */
  def alphaRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "[^A-Za-z]", "")) / length(text))

  /** Ratio of distinct tokens to tokens — low values flag boilerplate /
    * repetition (0.0 for empty). */
  def uniqueTokenRatio(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(array_distinct(toks)) / size(toks))
  }

  /** Corpus vocabulary: token → document frequency + total occurrences,
    * the input to tokenizer training / rare-word filtering. One explode +
    * one aggregation — shuffles on the token, scales with corpus size. */
  def vocabulary(docs: org.apache.spark.sql.DataFrame,
      textCol: String): org.apache.spark.sql.DataFrame =
    docs
      .select(explode(array_distinct(tokens(col(textCol)))).as("token"),
        lit(1L).as("df"))
      .groupBy("token").agg(count(lit(1)).as("doc_freq"))

  /** TF-IDF scores per (doc, token): tf = in-doc count, idf =
    * ln(N / df). Natural log on both engines is libm double math —
    * oracle comparisons round the score. */
  def tfidf(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    // corpus size as a broadcast 1-row aggregate, NOT an eager count():
    // an action inside plan-building would scan the corpus an extra time
    val n = docs.agg(count(lit(1)).cast("double").as("_n_docs"))
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    // doc frequency via vocabulary()'s distinct-explode, NOT derived
    // from the tf aggregate: tf feeds two plan branches and Spark
    // cannot reuse the (doc, token) exchange across them (projections
    // differ), so deriving df from tf re-runs the full aggregation —
    // measured 2.4× slower than this second light explode
    val df = vocabulary(docs, textCol)
    tf.join(df, Seq("token"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("_n_docs") / col("doc_freq")), 6))
      .select(col("doc_id"), col("token"), col("tf"), col("tfidf"))
  }

  /** Composite quality score in [0,1]: mean of three bounded signals —
    * length (saturating at 200 tokens), lexical diversity, alpha ratio.
    * The blend is illustrative; each signal is independently exposed. */
  def qualityScore(text: Column): Column = {
    val lenSignal = least(tokenCount(text) / lit(200.0), lit(1.0))
    (lenSignal + uniqueTokenRatio(text) + alphaRatio(text)) / 3.0
  }

  // ------------------------- repetition signals (Gopher, Rae et al. 2021)
  // Per-document repetition measures from the Gopher quality pipeline
  // (§A1.1): duplicate lines and repeated word n-grams flag boilerplate,
  // spam, and scraper loops. All pure array expressions — O(n log n) per
  // DOCUMENT (sorted run-length fold, see runFold), embarrassingly
  // parallel, zero shuffle; documents are short relative to executors,
  // so the 100 TB cost is CPU on the scan, which is exactly where it
  // should be.

  /** Non-blank trimmed lines of a document. */
  def docLines(text: Column): Column =
    filter(transform(split(text, "\n"), l => trim(l)),
      l => length(l) > 0)

  /** Fraction of lines that are duplicates of an earlier line
    * (0.0 for docs with ≤1 line). */
  def duplicateLineFraction(text: Column): Column = {
    val ls = docLines(text)
    when(size(ls) === 0, lit(0.0))
      .otherwise((size(ls) - size(array_distinct(ls))) /
        size(ls).cast("double"))
  }

  /** Per-distinct-element fold without the O(distinct × n) nested
    * filter: sort once, then walk the sorted array tracking the current
    * equal-run; `contrib(elem, runLen)` enters the accumulator via
    * `combine` at every run boundary. Equivalent to "for each distinct
    * g: combine(contrib(g, count(g)))" at O(n log n) per document —
    * which matters because higher-order functions evaluate interpreted
    * (no whole-stage codegen), and the nested-filter form burned
    * MINUTES per task on long boilerplate-heavy documents. */
  private def runFold(arr: Column,
      contrib: (Column, Column) => Column,
      combine: (Column, Column) => Column): Column = {
    val zero = struct(lit("").as("prev"), lit(0L).as("run"),
      lit(0L).as("acc"))
    def roll(st: Column) = combine(st.getField("acc"),
      contrib(st.getField("prev"), st.getField("run")))
    aggregate(array_sort(arr), zero,
      (st, x) => {
        val run = st.getField("run")
        when(run === 0L,
          struct(x.as("prev"), lit(1L).as("run"),
            st.getField("acc").as("acc")))
          .when(x === st.getField("prev"),
            struct(x.as("prev"), (run + 1L).as("run"),
              st.getField("acc").as("acc")))
          .otherwise(struct(x.as("prev"), lit(1L).as("run"),
            roll(st).as("acc")))
      },
      st => when(st.getField("run") === 0L, st.getField("acc"))
        .otherwise(roll(st)))
  }

  /** Fraction of CHARACTERS sitting in lines that occur more than once
    * — catches a giant boilerplate block repeated twice that the line-
    * count fraction underweights. */
  def duplicateLineCharFraction(text: Column): Column = {
    val ls = docLines(text)
    val total = aggregate(ls, lit(0L), (acc, l) => acc + length(l))
    val dup = runFold(ls,
      (l, c) => when(c > 1, c * length(l).cast("long")).otherwise(lit(0L)),
      (a, b) => a + b)
    when(total === 0, lit(0.0)).otherwise(dup / total.cast("double"))
  }

  /** ALL word n-grams in order (duplicates kept — this is the
    * occurrence list, unlike [[shingles]] which is the distinct set). */
  def ngramList(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(toks) - lit(n)),
        i => concat_ws(" ", (0 until n).map(j =>
          element_at(toks, i + lit(j + 1))): _*)))
  }

  /** Fraction of the document's characters covered by the single most
    * repeated n-gram: max over distinct n-grams g of count(g)·len(g),
    * over the doc's char count, capped at 1 (occurrences can overlap).
    * Gopher gates top-2/3/4-grams at 0.20/0.18/0.16. */
  def topNgramCharFraction(text: Column, n: Int): Column = {
    val ng = ngramList(text, n)
    val best = runFold(ng,
      (g, c) => c * length(g).cast("long"),
      (a, b) => greatest(a, b))
    when(size(ng) === 0 || length(text) === 0, lit(0.0))
      .otherwise(least(best / length(text).cast("double"), lit(1.0)))
  }

  /** Fraction of characters in n-grams that occur more than once (all
    * occurrences counted, overlaps double-counted — hence the cap).
    * Gopher gates duplicated 5..10-grams at 0.15 down to 0.10. */
  def dupNgramCharFraction(text: Column, n: Int): Column = {
    val ng = ngramList(text, n)
    val dup = runFold(ng,
      (g, c) => when(c > 1, c * length(g).cast("long")).otherwise(lit(0L)),
      (a, b) => a + b)
    when(size(ng) === 0 || length(text) === 0, lit(0.0))
      .otherwise(least(dup / length(text).cast("double"), lit(1.0)))
  }

  /** Gopher thresholds (published): line fractions, top-n-gram char
    * fractions, duplicated-n-gram char fractions. Public so callers
    * that compute the signal COLUMNS anyway (e.g. a query reporting
    * them) can assemble the gate from those columns via
    * [[repetitionGateFromSignals]] instead of re-deriving eleven
    * signal trees — higher-order functions evaluate interpreted, so a
    * duplicated tree is duplicated CPU, not just a bigger plan. */
  val DupLineThreshold = 0.30
  val DupLineCharThreshold = 0.20
  val TopNgramThresholds: Seq[(Int, Double)] =
    Seq(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
  val DupNgramThresholds: Seq[(Int, Double)] =
    Seq(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10)

  /** The gate assembled from pre-computed signal columns — `top` must
    * cover n = 2,3,4 and `dup` n = 5..10 (same order/values as the
    * signal functions). */
  def repetitionGateFromSignals(dupLine: Column, dupLineChar: Column,
      top: Map[Int, Column], dup: Map[Int, Column]): Column = {
    val checks =
      Seq(dupLine <= DupLineThreshold, dupLineChar <= DupLineCharThreshold) ++
      TopNgramThresholds.map { case (n, t) => top(n) <= t } ++
      DupNgramThresholds.map { case (n, t) => dup(n) <= t }
    checks.reduce(_ && _)
  }

  /** The Gopher repetition gate: true when every repetition signal is
    * under its published threshold. */
  def repetitionGate(text: Column): Column =
    repetitionGateFromSignals(
      duplicateLineFraction(text), duplicateLineCharFraction(text),
      TopNgramThresholds.map { case (n, _) =>
        n -> topNgramCharFraction(text, n) }.toMap,
      DupNgramThresholds.map { case (n, _) =>
        n -> dupNgramCharFraction(text, n) }.toMap)
}
