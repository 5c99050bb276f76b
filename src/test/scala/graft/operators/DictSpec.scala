package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class DictSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def docs = Seq(
    (1L, "b"), (2L, "b"), (3L, "b"),
    (4L, "a"), (5L, "a"),
    (6L, "z"), (7L, "c"), (8L, "c") // c ties z? no: c=2, z=1
  ).toDF("id", "s")

  test("build: codes dense from 1, frequency desc, value-asc tiebreak") {
    val d = Dict.build(docs, "s")
      .as[(Int, String, Long)].collect().sortBy(_._1).toList
    assert(d == List((1, "b", 3L), (2, "a", 2L), (3, "c", 2L),
      (4, "z", 1L)))
  }

  test("encode/decode roundtrip; unknown value gets null code") {
    val d = Dict.build(docs, "s")
    val extra = docs.union(Seq((9L, "new")).toDF("id", "s"))
    val enc = Dict.encode(extra, "s", d)
    val back = Dict.decode(enc.select("id", "code"), "code", d, "s2")
      .join(extra, "id")
    assert(back.filter(col("s") =!= lit("new"))
      .filter(col("s2") =!= col("s")).count() == 0)
    assert(enc.filter(col("s") === "new")
      .filter(col("code").isNotNull).count() == 0)
  }

  test("encode broadcasts: no shuffle of the fact side") {
    val d = Dict.build(docs, "s")
    val plan = Dict.encode(docs, "s", d)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("null values are excluded from the dictionary, encode to null") {
    val withNull = docs.union(Seq((10L, null.asInstanceOf[String]))
      .toDF("id", "s"))
    val d = Dict.build(withNull, "s")
    assert(d.filter(col("value").isNull).count() == 0)
    val enc = Dict.encode(withNull, "s", d)
    assert(enc.filter(col("id") === 10L).select("code")
      .collect().head.isNullAt(0))
  }
}
