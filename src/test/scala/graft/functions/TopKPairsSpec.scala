package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPairsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  test("equals the window formulation, including ties cut by id") {
    // g=1 has a three-way tie at v=50 — the (v, id) total order keeps
    // ids 12, 11 (DESC) and drops 10 at k=2
    val df = Seq(
      (1L, 10L, 50L), (1L, 11L, 50L), (1L, 12L, 50L), (1L, 13L, 40L),
      (2L, 20L, 5L), (2L, 21L, 7L),
      (3L, 30L, 1L) // fewer rows than k
    ).toDF("g", "id", "v")
    val got = df.groupBy(col("g"))
      .agg(call_function("topk_pairs", col("v"), col("id"), lit(2))
        .as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).as("rk"),
        col("col.ord").as("v"), col("col.id").as("id"))
    val w = Window.partitionBy(col("g"))
      .orderBy(col("v").desc, col("id").desc)
    val want = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2)
      .select(col("g"), col("rk").cast("long").as("rk"), col("v"),
        col("id"))
    assert(got.as[(Long, Long, Long, Long)].collect().toSet ==
      want.as[(Long, Long, Long, Long)].collect().toSet)
    assert(got.count() == 5) // 2 + 2 + 1
  }

  test("executed plan has no WindowExec and aggregates partially") {
    val df = Seq((1L, 1L, 1L), (1L, 2L, 2L)).toDF("g", "id", "v")
    val q = df.groupBy(col("g"))
      .agg(call_function("topk_pairs", col("v"), col("id"), lit(2))
        .as("top"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window in:\n$plan")
    // TypedImperativeAggregate plans as ObjectHashAggregate with a
    // partial pass before the exchange — the bounded-shuffle claim
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.toLowerCase.contains("partial_topk_pairs"), plan)
  }

  test("exact duplicate (ord, id) rows collapse: the documented set " +
      "contract") {
    // unique-id-per-row is the contract; when violated, duplicates
    // dedup in the buffer and the group can return fewer than k rows
    // (the window formulation would keep both copies) — pinned here so
    // the registry comment stays true
    val df = Seq((1L, 7L, 10L), (1L, 7L, 10L), (1L, 8L, 5L))
      .toDF("g", "id", "v")
    val got = df.groupBy(col("g"))
      .agg(call_function("topk_pairs", col("v"), col("id"), lit(3))
        .as("top"))
      .select(size(col("top"))).as[Int].head()
    assert(got == 2) // not 3: the duplicate (10, 7) collapsed
  }

  test("nulls are skipped, not kept") {
    val df = Seq(
      (1L, Some(1L), Some(10L)), (1L, Some(2L), None),
      (1L, None, Some(30L))
    ).toDF("g", "id", "v")
    val got = df.groupBy(col("g"))
      .agg(call_function("topk_pairs", col("v"), col("id"), lit(5))
        .as("top"))
      .select(size(col("top"))).as[Int].head()
    assert(got == 1)
  }
}
