package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class TtlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def ev = Seq(
    (1L, "2024-01-01 10:00:00", "click", 2.5),
    (2L, "2024-01-01 11:00:00", "click", 1.5),
    (3L, "2024-01-01 12:00:00", "view", 1.0),
    (4L, "2024-01-10 09:00:00", "click", 4.0),
    (5L, "2024-01-10 10:00:00", "view", 3.0)
  ).toDF("id", "ts", "typ", "v")
    .withColumn("ts", col("ts").cast("timestamp"))

  private val cutoff = lit("2024-01-05 00:00:00").cast("timestamp")

  test("expire drops strictly-older rows only") {
    val got = Ttl.expire(ev, "ts", cutoff).select("id")
      .as[Long].collect().toSet
    assert(got == Set(4L, 5L))
  }

  test("rollupExpired: old rows collapse to grain, live keep full grain") {
    val got = Ttl.rollupExpired(ev, "ts", cutoff,
      keys = Seq("day" -> col("ts").cast("date").cast("string"),
        "typ" -> col("typ")),
      aggs = Seq(
        ("n", count(lit(1)), lit(1L)),
        ("v_sum", sum(col("v").cast("decimal(18,2)")).cast("double"),
          col("v").cast("decimal(18,2)").cast("double")),
        ("v_max", max(col("v")), col("v"))),
      liveCols = Seq("id" -> col("id")))
    val rows = got.select("day", "typ", "id", "n", "v_sum", "v_max",
        "rolled")
      .collect().map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getBoolean(6))).toSet
    assert(rows == Set(
      ("2024-01-01", "click", -1L, 2L, 4.0, 2.5, true),
      ("2024-01-01", "view", -1L, 1L, 1.0, 1.0, true),
      ("2024-01-10", "click", 4L, 1L, 4.0, 4.0, false),
      ("2024-01-10", "view", 5L, 1L, 3.0, 3.0, false)))
  }

  test("rollup rewrite is idempotent at the aggregate grain") {
    // re-running retention over already-live rows changes nothing
    val once = Ttl.expire(ev, "ts", cutoff)
    val twice = Ttl.expire(once, "ts", cutoff)
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("expire prunes at the scan: cutoff reaches PushedFilters") {
    val dir = java.nio.file.Files.createTempDirectory("ttl").toString
    ev.write.mode("overwrite").parquet(dir)
    val plan = Ttl.expire(spark.read.parquet(dir), "ts", cutoff)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(ts), " +
      "GreaterThanOrEqual(ts,"), plan)
  }
}
