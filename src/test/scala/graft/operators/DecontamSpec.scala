package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** n-gram benchmark decontamination on a hand-built corpus with known
  * overlaps: exact matched/overlap values, threshold behavior on both
  * arms (minMatched OR minOverlap), self-match exclusion, and the
  * clean-corpus zero case. */
class DecontamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  // 3-grams are whitespace-token trigrams; doc 1 shares exactly its
  // first sentence with bench 101, doc 2 is a verbatim bench copy,
  // doc 3 is clean
  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "exact copy of a benchmark question lives here verbatim"),
    (3L, "completely original content with no benchmark overlap at all")
  ).toDF("doc_id", "text")

  private lazy val bench = Seq(
    (101L, "the quick brown fox jumps over a different ending"),
    (102L, "exact copy of a benchmark question lives here verbatim")
  ).toDF("bench_id", "text")

  test("overlapPairs reports exact shared-ngram counts") {
    val pairs = Decontam.overlapPairs(docs, bench, "doc_id", "text",
        "bench_id", "text", n = 3)
      .select("doc_id", "bench_id", "matched", "n_ngrams")
      .as[(Long, Long, Long, Long)].collect().toSet
    // doc 1: tokens 10 -> 8 distinct trigrams; shares the 4 trigrams of
    // "the quick brown fox jumps over" with bench 101
    assert(pairs.contains((1L, 101L, 4L, 8L)))
    // doc 2: verbatim copy -> all 7 trigrams match bench 102
    assert(pairs.contains((2L, 102L, 7L, 7L)))
    // doc 3 collides with nothing
    assert(!pairs.exists(_._1 == 3L))
  }

  test("flag: matched threshold, overlap threshold, clean doc") {
    val f = Decontam.flag(docs, bench, "doc_id", "text", "bench_id",
        "text", n = 3, minMatched = 5L, minOverlap = 0.9)
      .as[(Long, Double, Long, Int)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1: 4 matches (< 5) and overlap 0.5 (< 0.9) -> clean
    assert(f(1L) == ((1L, 0.5, 4L, 0)))
    // doc 2: full overlap trips BOTH arms
    assert(f(2L) == ((2L, 1.0, 7L, 1)))
    // doc 3: no collisions at all
    assert(f(3L) == ((3L, 0.0, 0L, 0)))
    // single-arm trip: minMatched=4 flags doc 1 even at minOverlap=1.0
    val byCount = Decontam.flag(docs, bench, "doc_id", "text",
        "bench_id", "text", n = 3, minMatched = 4L, minOverlap = 1.0)
      .filter("doc_id = 1").as[(Long, Double, Long, Int)].head()
    assert(byCount._4 == 1)
  }

  test("a doc sharing its id with a bench doc is not self-matched") {
    val selfBench = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("bench_id", "text")
    val f = Decontam.flag(docs, selfBench, "doc_id", "text", "bench_id",
        "text", n = 3, minMatched = 1L)
      .filter("doc_id = 1").as[(Long, Double, Long, Int)].head()
    assert(f == ((1L, 0.0, 0L, 0)))
  }

  test("clean corpus: empty pair frame, nothing flagged") {
    val cleanBench = Seq((201L, "zero shared trigrams with any doc"))
      .toDF("bench_id", "text")
    assert(Decontam.overlapPairs(docs, cleanBench, "doc_id", "text",
      "bench_id", "text", n = 3).count() == 0)
    assert(Decontam.flag(docs, cleanBench, "doc_id", "text", "bench_id",
      "text", n = 3).filter("contaminated = 1").count() == 0)
  }
}
