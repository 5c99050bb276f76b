package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  // quotes: (key, ts, qid, px) — two keys, out-of-order insert, ties
  private lazy val quotes = Seq(
    ("a", 10L, 1L, 1.0), ("a", 20L, 2L, 2.0), ("a", 20L, 3L, 3.0),
    ("a", 40L, 4L, 4.0),
    ("b", 15L, 5L, 5.0)
  ).toDF("k", "rts", "qid", "px")

  // trades: (key, ts, tid)
  private lazy val trades = Seq(
    ("a", 5L, 100L),  // before any quote
    ("a", 20L, 101L), // tied with quotes 2 and 3
    ("a", 25L, 102L), // between
    ("a", 99L, 103L), // after all
    ("b", 15L, 104L), // exact tie
    ("c", 50L, 105L)  // key with no quotes
  ).toDF("k", "lts", "tid")

  private def backward = AsofJoin.asof(trades, quotes, Seq("k"),
    "lts", "rts", Seq("qid", "px"), tiebreak = "qid")

  test("backward as-of picks the latest quote at-or-before each trade") {
    val got = backward.select("tid", "r_qid").as[(Long, Option[Long])]
      .collect().toMap
    assert(got(100L).isEmpty)        // nothing before ts=5
    assert(got(101L).contains(3L))   // tie at ts=20 -> greatest qid wins
    assert(got(102L).contains(3L))
    assert(got(103L).contains(4L))
    assert(got(104L).contains(5L))   // equal ts is visible
    assert(got(105L).isEmpty)        // no quotes for key c
  }

  test("every left row survives exactly once, with its own columns") {
    val out = backward.collect()
    assert(out.length == trades.count())
    val cols = backward.columns.toSeq
    assert(cols == Seq("k", "lts", "tid", "r_qid", "r_px", "r_rts"))
  }

  test("forward as-of picks the earliest quote at-or-after each trade") {
    val got = AsofJoin.asof(trades, quotes, Seq("k"), "lts", "rts",
      Seq("qid", "px"), tiebreak = "qid", forward = true)
      .select("tid", "r_qid").as[(Long, Option[Long])].collect().toMap
    assert(got(100L).contains(1L))
    // forward at equal ts: visible; greatest tiebreak among ties wins
    assert(got(101L).contains(3L))
    assert(got(102L).contains(4L))
    assert(got(103L).isEmpty)        // nothing at-or-after ts=99
    assert(got(104L).contains(5L))
    assert(got(105L).isEmpty)
  }

  test("matched payload carries the right row's values") {
    val r = backward.filter($"tid" === 103L)
      .select("r_qid", "r_px", "r_rts").as[(Long, Double, Long)].head()
    assert(r == ((4L, 4.0, 40L)))
  }
}
