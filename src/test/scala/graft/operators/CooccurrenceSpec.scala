package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class CooccurrenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  // 4 baskets: {a,b} always together; c alone; d with everything once
  private lazy val baskets = Seq(
    (1L, "a"), (1L, "b"), (1L, "a"), // repetition must not inflate
    (2L, "a"), (2L, "b"), (2L, "d"),
    (3L, "c"),
    (4L, "c"), (4L, "d")
  ).toDF("g", "i")

  test("pairCounts: distinct presence, ordered pairs, exact counts") {
    val got = Cooccurrence.pairCounts(baskets, "g", "i")
      .as[(String, String, Long)].collect()
      .map { case (a, b, n) => (a, b) -> n }.toMap
    assert(got == Map(
      ("a", "b") -> 2L, // baskets 1 and 2, repetition ignored
      ("a", "d") -> 1L, ("b", "d") -> 1L, ("c", "d") -> 1L))
    // ordering invariant: every pair is (a < b)
    got.keys.foreach { case (a, b) => assert(a < b) }
  }

  test("pmi: always-together pair scores highest") {
    val got = Cooccurrence.pmi(baskets, "g", "i")
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map { case (a, b, np, na, nb, p) =>
        (a, b) -> ((np, na, nb, p)) }.toMap
    // a,b: n_pair=2, n_a=2, n_b=2, N=4 → pmi = ln(2·4/(2·2)) = ln 2
    val (np, na, nb, p) = got(("a", "b"))
    assert((np, na, nb) == ((2L, 2L, 2L)))
    assert(math.abs(p - math.log(2.0)) < 1e-6)
    // c,d co-occur at independence: ln(1·4/(2·2)) = 0
    assert(got(("c", "d"))._4 == 0.0)
    // the exclusive pair beats the incidental ones
    assert(got.values.map(_._4).max == p)
  }

  test("minPair filter drops singleton co-occurrences") {
    val got = Cooccurrence.pmi(baskets, "g", "i", minPair = 2L)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(got.map(r => (r._1, r._2)).toSet == Set(("a", "b")))
  }
}
