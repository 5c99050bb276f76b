package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GlobalRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private lazy val df = {
    // scores engineered with ties so the id tiebreaker matters
    val rows = (0 until 500).map(i => (i.toLong, (i * 37 % 25).toDouble))
    rows.toDF("id", "score")
  }

  private def expected: Seq[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, _), r) => (id, r.toLong) }.toSeq

  test("rank equals the global (score desc, id) row_number") {
    val got = GlobalRank.rank(df,
        Seq(col("score").desc, col("id")), "rank")
      .select("id", "rank").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == expected.sortBy(_._1))
  }

  test("ranks are invariant to the partition count") {
    val a = GlobalRank.rank(df, Seq(col("score").desc, col("id")),
        "rank", partitions = 2)
      .select("id", "rank").as[(Long, Long)].collect().toSet
    val b = GlobalRank.rank(df.repartition(13),
        Seq(col("score").desc, col("id")), "rank", partitions = 7)
      .select("id", "rank").as[(Long, Long)].collect().toSet
    assert(a == b)
    assert(a == expected.toSet)
  }

  test("ascending key, dense 0-based cover of [0, n)") {
    val ranked = GlobalRank.rank(df, Seq(col("id")), "r")
      .select("id", "r").as[(Long, Long)].collect()
    assert(ranked.forall { case (id, r) => id == r })
  }

  test("empty frame ranks to an empty frame") {
    val empty = df.filter(col("id") < 0)
    assert(GlobalRank.rank(empty, Seq(col("id"))).count() == 0)
  }

  test("no single-partition window appears in the executed plans") {
    // the operator's entire point: nothing in its lineage is a
    // partitionless WindowExec
    val ranked = GlobalRank.rank(df, Seq(col("score").desc, col("id")))
    val plan = ranked.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window in:\n$plan")
  }

  test("groupedNtile: floor cut, dense buckets, no per-group window") {
    // 2 groups × uneven sizes (7 and 3), k=3 — floor cut means group
    // "a" splits 3/2/2... no: with n=7, bucket = i*3 div 7 →
    // 0,0,0,1,1,2,2 (sizes 3,2,2); n=3 → 0,1,2 (one each).
    val rows = (0 until 7).map(i => ("a", i.toLong)) ++
      (0 until 3).map(i => ("b", i.toLong))
    val g = rows.toDF("g", "v")
    val got = GlobalRank.groupedNtile(g, Seq("g"), Seq(col("v")), 3)
      .select("g", "v", "bucket").as[(String, Long, Long)]
      .collect().toSet
    val want = ((0 until 7).map(i => ("a", i.toLong, i * 3L / 7)) ++
      (0 until 3).map(i => ("b", i.toLong, i.toLong))).toSet
    assert(got == want)
    val plan = GlobalRank.groupedNtile(g, Seq("g"), Seq(col("v")), 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window in:\n$plan")
  }
}
