package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class CollapseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  // (key, payload, sign, seq)
  private def feed(rows: (Long, String, Int, Long)*) =
    rows.toDF("k", "v", "sign", "seq")

  test("collapse: update keeps only the latest state") {
    val got = Collapse.collapse(
      feed((1L, "a", 1, 1L), (1L, "a", -1, 2L), (1L, "a2", 1, 3L)),
      Seq("k"), "sign", "seq")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a2")))
    assert(!Collapse.collapse(feed((1L, "a", 1, 1L)), Seq("k"), "sign",
      "seq").columns.contains("sign"))
  }

  test("collapse: fully cancelled key vanishes; lone cancel stays dark") {
    val got = Collapse.collapse(
      feed((1L, "a", 1, 1L), (1L, "a", -1, 2L), // deleted
        (2L, "ghost", -1, 1L), // cancel with no state — net -1
        (3L, "keep", 1, 1L)),
      Seq("k"), "sign", "seq")
      .as[(Long, String)].collect().toSet
    assert(got == Set((3L, "keep")))
  }

  test("collapse is insertion-order independent (seq decides)") {
    val rows = Seq((9L, "s1", 1, 1L), (9L, "s1", -1, 2L),
      (9L, "s2", 1, 3L))
    val a = Collapse.collapse(feed(rows: _*), Seq("k"), "sign", "seq")
    val b = Collapse.collapse(feed(rows.reverse: _*), Seq("k"), "sign",
      "seq")
    assert(a.as[(Long, String)].collect().toSet ==
      b.as[(Long, String)].collect().toSet)
  }

  // (key, payload, ver, sign)
  private def vfeed(rows: (Long, String, Long, Int)*) =
    rows.toDF("k", "v", "ver", "sign")

  test("versioned: cancel pairs with its own version only") {
    // late-arriving cancel of v1 after v2's state: v1 folds, v2 stays
    val got = Collapse.collapseVersioned(
      vfeed((1L, "v1", 1L, 1), (1L, "v2", 2L, 1), (1L, "v1", 1L, -1)),
      Seq("k"), "ver", "sign")
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "v2", 2L)))
  }

  test("versioned: at-least-once duplicate state cannot be mis-cancelled") {
    // duplicated v1 state (net +2): key visible once at v1
    val got = Collapse.collapseVersioned(
      vfeed((1L, "v1", 1L, 1), (1L, "v1", 1L, 1)),
      Seq("k"), "ver", "sign")
      .as[(Long, String, Long)].collect().toList
    assert(got == List((1L, "v1", 1L)))
  }

  test("versioned: balanced key vanishes even with interleaved versions") {
    val got = Collapse.collapseVersioned(
      vfeed((1L, "v1", 1L, 1), (1L, "v2", 2L, 1),
        (1L, "v1", 1L, -1), (1L, "v2", 2L, -1),
        (2L, "live", 1L, 1)),
      Seq("k"), "ver", "sign")
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((2L, "live", 1L)))
  }

  test("one exchange: both collapses plan a single shuffle") {
    val plan = Collapse.collapse(feed((1L, "a", 1, 1L), (2L, "b", 1, 1L)),
      Seq("k"), "sign", "seq")
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
    val vplan = Collapse.collapseVersioned(
      vfeed((1L, "v1", 1L, 1), (2L, "v1", 1L, 1)),
      Seq("k"), "ver", "sign")
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(vplan).size == 1, vplan)
  }
}
