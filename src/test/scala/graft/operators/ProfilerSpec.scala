package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class ProfilerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some("a"), Some(1.5)),
    (2L, Some("b"), None),
    (3L, None, Some(2.5)),
    (4L, Some("a"), Some(2.5))
  ).toDF("id", "s", "v")

  test("profile: exact counts, nulls, distincts, min/max as strings") {
    val got = Profiler.profile(df, Seq("id", "s", "v"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("id") == (("id", 4L, 0L, 4L, "1", "4")))
    assert(got("s") == (("s", 4L, 1L, 2L, "a", "b")))
    assert(got("v") == (("v", 4L, 1L, 2L, "1.5", "2.5")))
  }

  test("profileApprox: identical shape, distincts within tolerance") {
    val docs = spark.read
      .parquet(s"${TestSpark.Sf0001}/lineitem.parquet")
    val cols = Seq("l_orderkey", "l_returnflag", "l_shipdate")
    val exact = Profiler.profile(docs, cols)
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    val approx = Profiler.profileApprox(docs, cols, rsd = 0.02)
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    cols.foreach { c =>
      val e = exact(c); val a = approx(c)
      // everything except n_distinct is exact in both variants
      assert((a._2, a._3, a._5, a._6) == ((e._2, e._3, e._5, e._6)), c)
      // HLL++ at rsd 2%: allow 5σ
      assert(math.abs(a._4 - e._4) <= math.max(2, (e._4 * 0.10).toLong),
        s"$c: approx ${a._4} vs exact ${e._4}")
    }
  }

  test("plan shape: exact uses Expand, approx does not (one-scan claim)") {
    val exactPlan = Profiler.profile(df, Seq("id", "s"))
      .queryExecution.executedPlan.toString
    val approxPlan = Profiler.profileApprox(df, Seq("id", "s"))
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"))
    assert(!approxPlan.contains("Expand"))
  }
}
