package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus retrieval scoring — BM25 over a fixed query, the "find the
  * documents most like this probe" primitive data-curation pipelines
  * use for targeted sampling and quality-anchored retrieval.
  *
  * Shape for 100 TB: the naive formulation explodes tokens and joins a
  * posting list; this one never shuffles the corpus at all. Per-doc
  * term frequencies for the |Q| query terms are scan-local array
  * expressions; the corpus-level statistics (N, Σlen, one df per term)
  * are ONE map-side-combined aggregate producing |Q|+2 numbers; the
  * scoring pass is a second scan with the idf weights folded in as
  * literals. Two scans, zero shuffles, |Q|+2 numbers to the driver.
  *
  * Determinism: N/df are exact counts and Σlen an exact integer sum,
  * so `avgdl` and every idf are identical doubles in any engine; the
  * per-doc score is pure double arithmetic in a fixed association
  * order (the oracle mirrors it verbatim).
  */
object Retrieval {

  /** BM25 scores for every document matching ≥ 1 query term.
    *
    * @return (doc_id, bm25): score rounded to 6 places
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25: empty query")
    require(queryTerms.distinct == queryTerms, "bm25: duplicate terms")
    val toks = TextFunctions.tokens(col(textCol))
    val tfCols = queryTerms.zipWithIndex.map { case (t, i) =>
      size(filter(toks, x => x === t)).cast("double").as(s"tf$i")
    }
    val base = docs.select(
      (col(idCol).as("doc_id") +: size(toks).cast("double").as("dl") +:
        tfCols): _*)
    val stats = base.agg(
      count(lit(1)).cast("double").as("n"),
      sum("dl").as("sl") +:
        queryTerms.indices.map(i =>
          sum((col(s"tf$i") > 0).cast("long")).as(s"df$i")): _*)
      .head()
    val n = stats.getDouble(0)
    require(n > 0, "bm25: empty corpus")
    val avgdl = stats.getDouble(1) / n
    val idf = queryTerms.indices.map { i =>
      val df = stats.getLong(2 + i).toDouble
      // Robertson-Sparck Jones idf, the +1 variant that stays positive
      math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    }
    val norm = lit(k1) *
      (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl))
    val score = queryTerms.indices.map { i =>
      lit(idf(i)) * (col(s"tf$i") * lit(k1 + 1)) / (col(s"tf$i") + norm)
    }.reduceLeft(_ + _)
    val anyMatch =
      queryTerms.indices.map(i => col(s"tf$i")).reduceLeft(_ + _) > 0.0
    base.filter(anyMatch)
      .select(col("doc_id"), round(score, 6).as("bm25"))
  }

  /** Exact phrase search through a positional inverted index — the
    * posting-list adjacency join a search engine runs, as a Spark
    * plan. The corpus explodes ONLY to postings of the |P| phrase
    * terms (the `isin` filter rides the projection, so scan output is
    * hits-sized, not token-count-sized); the phrase then assembles by
    * chaining equi-joins on `(doc, position − offset)` — each join
    * keyed on the same (doc, anchor-position) pair, so consecutive
    * terms co-locate after one exchange. No regex over 100 TB of
    * text, no full-token shuffle.
    *
    * @return `(doc_id, n_hits)` — documents containing the phrase at
    *         least once, with the exact occurrence count (overlapping
    *         occurrences counted separately, one per anchor). */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch: empty phrase")
    val posts = docs.select(col(idCol).as("_id"),
        posexplode(TextFunctions.tokens(col(textCol)))
          .as(Seq("_p", "_t")))
      .filter(col("_t").isin(phrase.distinct: _*))
    var cur = posts.filter(col("_t") === phrase.head)
      .select(col("_id"), col("_p").as("_p0"))
    phrase.zipWithIndex.drop(1).foreach { case (w, k) =>
      cur = cur.join(
        posts.filter(col("_t") === w)
          .select(col("_id"), (col("_p") - k).as("_p0")),
        Seq("_id", "_p0"))
    }
    cur.groupBy(col("_id"))
      .agg(count(lit(1)).as("n_hits"))
      .select(col("_id").as(idCol), col("n_hits"))
  }
}
