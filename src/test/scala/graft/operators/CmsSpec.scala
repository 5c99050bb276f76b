package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CmsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  test("estimate is exact when the width avoids collisions") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c"))
      .toDF("k")
    val sketch = Cms.build(df, "k", width = 4096, depth = 3)
    val keys = Seq("a", "b", "c", "never-seen").toDF("k")
    val got = Cms.estimate(sketch, keys, "k", width = 4096, depth = 3)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 5L, "b" -> 3L, "c" -> 1L, "never-seen" -> 0L))
  }

  test("one-sided guarantee: est >= exact under heavy collisions") {
    val ev = spark.read.parquet(s"${TestSpark.Sf0001}/events.parquet")
      .select($"user_id")
    val sketch = Cms.build(ev, "user_id", width = 8, depth = 2)
    val exact = ev.groupBy("user_id").agg(count(lit(1)).as("exact"))
    val under = Cms.estimate(sketch, exact, "user_id", width = 8, depth = 2)
      .join(exact, "user_id")
      .filter($"est" < $"exact")
    assert(under.count() == 0)
  }

  test("sketch state is bounded by depth x width at any input size") {
    val ev = spark.read.parquet(s"${TestSpark.Sf0001}/events.parquet")
      .select($"user_id")
    val n = Cms.build(ev, "user_id", width = 16, depth = 3).count()
    assert(n <= 48)
  }
}
