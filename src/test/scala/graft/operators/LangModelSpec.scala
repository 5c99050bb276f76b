package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class LangModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a b a b"),   // bigrams: (a,b) (b,a) (a,b)
    (2L, "a b c"),     // (a,b) (b,c)
    (3L, "x"),         // < 2 tokens: no bigrams
    (4L, "")           // blank: no tokens at all
  ).toDF("doc_id", "text")

  test("bigrams explode adjacent token pairs; short/blank docs none") {
    val bg = LangModel.bigrams(docs, "doc_id", "text")
      .as[(Long, String, String)].collect().toSeq
    assert(bg.sorted == Seq(
      (1L, "a", "b"), (1L, "a", "b"), (1L, "b", "a"),
      (2L, "a", "b"), (2L, "b", "c")).sorted)
  }

  test("score matches the hand-computed smoothed bigram model") {
    // corpus counts: c(a,b)=3 c(b,a)=1 c(b,c)=1; cl(a)=3 cl(b)=2; V=3
    // (distinct right tokens: a b c); k=0.5
    def lp(c: Double, cl: Double) = math.log((c + 0.5) / (cl + 0.5 * 3))
    val ab = lp(3, 3); val ba = lp(1, 2); val bc = lp(1, 2)
    val expect = Map(
      1L -> (3L, (ab + ba + ab) / 3),
      2L -> (2L, (ab + bc) / 2))
    val got = LangModel.score(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, s) => id -> (n, s) }.toMap
    assert(got.keySet == Set(1L, 2L), "docs without bigrams are absent")
    expect.foreach { case (id, (n, s)) =>
      assert(got(id)._1 == n)
      assert(math.abs(got(id)._2 - s) < 1e-6,
        s"doc $id: got ${got(id)._2}, want $s")
    }
  }

  test("score is invariant to input partitioning") {
    val one = LangModel.score(docs.coalesce(1), "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    val many = LangModel.score(docs.repartition(7), "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    assert(one == many)
  }

  test("fluent text outscores shuffled text under the corpus model") {
    // a corpus with strong bigram structure + one garbled doc
    val fluent = (1L to 30L).map(i => (i, "the quick brown fox jumps"))
    val garbled = Seq((31L, "fox the jumps brown quick"))
    val corpus = (fluent ++ garbled).toDF("doc_id", "text")
    val scores = LangModel.score(corpus, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map { case (id, _, s) => id -> s }.toMap
    assert(scores(1L) > scores(31L),
      s"fluent ${scores(1L)} should beat garbled ${scores(31L)}")
  }
}
