package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The q_median plan must be the rank-based two-pass percentile — a
  * sort-window that spills to disk — NOT `percentile()`'s
  * ObjectHashAggregate, whose per-group value→count map merges on one
  * reducer per group (3 tasks holding every distinct double at 100 TB).
  */
class QMedianPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  test("plan: window rank, no ObjectHashAggregate percentile map") {
    val df = SparkEntry.queries("q_median")(spark, TestSpark.Sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.toLowerCase.contains("percentile"), plan)
    assert(plan.contains("Window"), plan)
    // both rank columns ride ONE exchange of the data-sized frame
    // (same partitionBy) — plus the tiny count-aggregate exchanges
    val dataExchanges = "Exchange hashpartitioning\\(l_returnflag".r
      .findAllIn(plan).size
    assert(dataExchanges <= 2, s"$dataExchanges data exchanges:\n$plan")
  }

  test("values: bit-identical to Spark's exact percentile()") {
    val got = SparkEntry.queries("q_median")(spark, TestSpark.Sf0001)
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    val want = spark.read
      .parquet(s"${TestSpark.Sf0001}/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.5)").as("med_qty"),
        expr("percentile(l_extendedprice, 0.25)").as("price_p25"),
        expr("percentile(l_extendedprice, 0.75)").as("price_p75"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }
}
