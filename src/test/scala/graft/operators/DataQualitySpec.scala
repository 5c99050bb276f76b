package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DataQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private lazy val child = Seq(
    (1L, 1L, Some(10.0)), (1L, 2L, Some(20.0)), (1L, 2L, Some(21.0)),
    (2L, 1L, None), (9L, 1L, Some(5.0))
  ).toDF("fk", "line", "amt")

  private lazy val parent = Seq(1L, 2L, 3L).toDF("pk")

  test("each rule counts its violations exactly") {
    val report = DataQuality.audit(Seq(
      DataQuality.uniqueKey(child, "pk_unique", Seq("fk", "line")),
      DataQuality.notNull(child, "amt_not_null", "amt"),
      DataQuality.foreignKey(child, parent, "fk_valid", "fk", "pk"),
      DataQuality.check(child, "amt_positive",
        col("amt").isNull || col("amt") > 0)
    )).as[(String, Long)].collect().toMap
    assert(report == Map(
      "pk_unique" -> 1L,     // (1,2) appears twice
      "amt_not_null" -> 1L,  // one NULL amt
      "fk_valid" -> 1L,      // fk=9 has no parent
      "amt_positive" -> 0L))
  }

  test("clean table audits to all zeros") {
    val clean = Seq((1L, 1L, Some(1.0))).toDF("fk", "line", "amt")
    val report = DataQuality.audit(Seq(
      DataQuality.uniqueKey(clean, "u", Seq("fk", "line")),
      DataQuality.notNull(clean, "n", "amt"),
      DataQuality.foreignKey(clean, parent, "f", "fk", "pk")
    )).as[(String, Long)].collect()
    assert(report.forall(_._2 == 0L))
  }

  test("auditTable fuses same-table rules into one scan") {
    val fused = DataQuality.auditTable(child, Seq(
      DataQuality.uniqueKeyRule("u", Seq("fk", "line")),
      DataQuality.notNullRule("n", "amt"),
      DataQuality.checkRule("c", col("amt").isNull || col("amt") > 0)))
    val got = fused.as[(String, Long)].collect().toMap
    assert(got == Map("u" -> 1L, "n" -> 1L, "c" -> 0L))
    // the whole rule set reads the source exactly once
    val plan = fused.queryExecution.executedPlan.toString
    assert("LocalTableScan".r.findAllIn(plan).length == 1, plan)
  }

  test("empty table: zero violations, not null counts") {
    val empty = spark.emptyDataset[(Long, Long, Option[Double])]
      .toDF("fk", "line", "amt")
    val report = DataQuality.audit(Seq(
      DataQuality.notNull(empty, "n", "amt"),
      DataQuality.check(empty, "c", col("amt") > 0)
    )).as[(String, Long)].collect().toMap
    assert(report == Map("n" -> 0L, "c" -> 0L))
  }
}
