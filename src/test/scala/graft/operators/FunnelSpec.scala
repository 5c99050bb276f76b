package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  // u1 completes in order; u2 clicks BEFORE viewing (order violated);
  // u3 views only; u4 skips the middle stage; u5 never views
  private lazy val ev = Seq(
    (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
    (2L, "click", 5L), (2L, "view", 6L), (2L, "purchase", 7L),
    (3L, "view", 1L),
    (4L, "view", 1L), (4L, "purchase", 2L),
    (5L, "click", 1L), (5L, "purchase", 2L)
  ).toDF("u", "t", "ts")

  test("stages count only in-order completions") {
    val got = Funnel.ordered(ev, "u", "t", "ts",
      Seq("view", "click", "purchase"))
      .as[(String, Int, Long)].collect().sortBy(_._2)
    // view: u1..u4; click after view: u1 only (u2's click precedes its
    // view); purchase after that click: u1
    assert(got.toSeq == Seq(("view", 1, 4L), ("click", 2, 1L),
      ("purchase", 3, 1L)))
  }

  test("strictly-after: same-timestamp stage does not advance") {
    val tie = Seq((1L, "view", 10L), (1L, "click", 10L)).toDF("u", "t", "ts")
    val got = Funnel.ordered(tie, "u", "t", "ts", Seq("view", "click"))
      .as[(String, Int, Long)].collect().sortBy(_._2)
    assert(got.toSeq == Seq(("view", 1, 1L), ("click", 2, 0L)))
  }

  test("funnel counts are monotone non-increasing") {
    val ns = Funnel.ordered(ev, "u", "t", "ts",
      Seq("view", "click", "purchase"))
      .as[(String, Int, Long)].collect().sortBy(_._2).map(_._3)
    assert(ns.sliding(2).forall { case Array(a, b) => b <= a; case _ => true })
  }

  import org.apache.spark.sql.functions.lit

  private def windowedDepths(rows: Seq[(Long, String, Long)], w: Long) =
    Funnel.windowed(rows.toDF("u", "t", "ts"), "u", "t", "ts",
      Seq("view", "click", "purchase"), lit(w))
      .as[(Int, Long)].collect().toMap

  test("windowed: a later anchor completes where the first cannot") {
    // from view@0 the chain dies (click@100 outside w=20); from
    // view@90 it completes — sliding semantics, not earliest-anchor
    val got = windowedDepths(Seq(
      (1L, "view", 0L), (1L, "view", 90L),
      (1L, "click", 100L), (1L, "purchase", 105L)), 20L)
    assert(got == Map(3 -> 1L))
  }

  test("windowed: window bounds are (anchor, anchor + w] per stage") {
    // u1: purchase exactly at anchor+w counts; u2: one past — depth 2
    val got = windowedDepths(Seq(
      (1L, "view", 0L), (1L, "click", 5L), (1L, "purchase", 10L),
      (2L, "view", 0L), (2L, "click", 5L), (2L, "purchase", 11L)), 10L)
    assert(got == Map(3 -> 1L, 2 -> 1L))
  }

  test("windowed: greedy earliest extension is what maximizes depth") {
    // clicks at 2 and 9; purchase at 8 — only the early click chains
    val got = windowedDepths(Seq(
      (1L, "view", 0L), (1L, "click", 2L), (1L, "click", 9L),
      (1L, "purchase", 8L)), 10L)
    assert(got == Map(3 -> 1L))
  }

  test("windowed: out-of-order stages never chain; no-anchor group absent") {
    val got = windowedDepths(Seq(
      (1L, "click", 0L), (1L, "purchase", 1L), (1L, "view", 2L),
      (2L, "click", 0L), (2L, "purchase", 1L)), 10L)
    assert(got == Map(1 -> 1L)) // u1 depth 1; u2 has no anchor at all
  }
}
