package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "spark shuffle join hash join"),       // 2x join, 1x hash
    (2L, "spark shuffle join sort merge"),      // 1x join
    (3L, "filter scan project sort limit"),     // no match
    (4L, "join join join join join"),           // saturated tf
    (5L, "spark shuffle hash sort merge")       // 1x hash
  ).toDF("doc_id", "text")

  private def scores: Map[Long, Double] =
    Retrieval.bm25(corpus, "doc_id", "text", Seq("join", "hash"))
      .as[(Long, Double)].collect().toMap

  test("non-matching docs are excluded") {
    assert(!scores.contains(3L))
    assert(scores.keySet == Set(1L, 2L, 4L, 5L))
  }

  test("more matched terms at equal length rank higher") {
    // doc 1 has both terms, doc 2 only 'join', same length
    assert(scores(1L) > scores(2L))
  }

  test("tf saturates: 5x join beats 1x join but not linearly") {
    assert(scores(4L) > scores(2L))
    val singleJoin = scores(2L)
    val only = Retrieval.bm25(corpus, "doc_id", "text", Seq("join"))
      .as[(Long, Double)].collect().toMap
    assert(only(4L) < 5 * only(2L),
      "bm25 tf term must be sub-linear in tf")
    assert(singleJoin > 0.0)
  }

  test("matches the hand-computed formula") {
    val n = 5.0
    val avgdl = 5.0 // every doc has 5 tokens
    def idf(df: Double) = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def term(tf: Double, df: Double) =
      idf(df) * (tf * 2.2) /
        (tf + 1.2 * (1.0 - 0.75 + 0.75 * 5.0 / avgdl))
    // doc 1: join tf=2 (df=3), hash tf=1 (df=2)
    val want = BigDecimal(term(2.0, 3.0) + term(1.0, 2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(scores(1L) == want)
  }

  test("rejects empty and duplicate query terms") {
    intercept[IllegalArgumentException] {
      Retrieval.bm25(corpus, "doc_id", "text", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Retrieval.bm25(corpus, "doc_id", "text", Seq("a", "a"))
    }
  }

  test("phraseSearch: adjacency only, overlaps counted per anchor") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "quick the brown"), // terms present, order wrong
      (3L, "the quick and the quick brown"), // 2 hits of 'the quick'
      (4L, "table table table"), // overlapping self-phrase
      (5L, "")
    ).toDF("doc_id", "text")
    val got = Retrieval.phraseSearch(docs, "doc_id", "text",
      Seq("the", "quick")).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 3L -> 2L))
    val tt = Retrieval.phraseSearch(docs, "doc_id", "text",
      Seq("table", "table")).as[(Long, Long)].collect().toMap
    assert(tt == Map(4L -> 2L))
  }

  test("phraseSearch: three-term phrase chains through the index") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b x c"), (3L, "x a b c")
    ).toDF("doc_id", "text")
    val got = Retrieval.phraseSearch(docs, "doc_id", "text",
      Seq("a", "b", "c")).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 3L -> 1L))
  }
}
