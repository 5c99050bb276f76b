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

  // (key, other, cnt, price-cents-as-decimal-string)
  private def sfeed(rows: (Long, Long, Long, String)*) =
    rows.toDF("k", "o", "cnt", "p")
      .selectExpr("k", "o", "cnt", "CAST(p AS DECIMAL(18,2)) AS p")

  test("summing: measures fold exactly, min pins the free column") {
    val got = Collapse.summing(
      sfeed((1L, 7L, 1L, "10.50"), (1L, 3L, 2L, "0.25"),
        (2L, 9L, 1L, "5.00")),
      Seq("k"), Seq("cnt", "p"), Seq("o"))
      .selectExpr("k", "o", "cnt", "CAST(p AS STRING)")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == Set((1L, 3L, 3L, "10.75"), (2L, 9L, 1L, "5.00")))
  }

  test("summing: all-zero group is eliminated, partial zero survives") {
    val got = Collapse.summing(
      sfeed((1L, 1L, 1L, "4.00"), (1L, 1L, -1L, "-4.00"), // vanishes
        (2L, 2L, 1L, "3.00"), (2L, 2L, -1L, "1.00")), // cnt 0, p 4.00
      Seq("k"), Seq("cnt", "p"), Seq("o"))
      .selectExpr("k", "cnt", "CAST(p AS STRING)")
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set((2L, 0L, "4.00")))
  }

  test("summing is insertion-order independent") {
    val rows = Seq((1L, 5L, 1L, "2.00"), (1L, 4L, 3L, "1.50"),
      (2L, 8L, 1L, "9.99"))
    val a = Collapse.summing(sfeed(rows: _*), Seq("k"),
      Seq("cnt", "p"), Seq("o")).collect().toSet
    val b = Collapse.summing(sfeed(rows.reverse: _*), Seq("k"),
      Seq("cnt", "p"), Seq("o")).collect().toSet
    assert(a == b)
  }

  test("summing: no sort, one hash aggregate exchange") {
    val plan = Collapse.summing(sfeed((1L, 1L, 1L, "1.00")),
      Seq("k"), Seq("cnt", "p"), Seq("o"))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("Sort "), plan) // window-free: partials combine
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
