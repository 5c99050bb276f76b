package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class ReshapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private lazy val df = Seq(
    ("A", "F", 1.0), ("A", "F", 2.0), ("A", "O", 10.0),
    ("B", "O", 5.0), // B has no F rows — cell must be null
    ("C", "X", 99.0) // X is undeclared — must be dropped, not a column
  ).toDF("flag", "status", "qty")

  test("pivot: declared values become columns, absent cells null") {
    val got = Reshape.pivot(df, Seq("flag"), "status", Seq("F", "O"),
      sum(col("qty")))
    assert(got.columns.toSeq == Seq("flag", "F", "O"))
    val rows = got.collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(rows == Set(
      ("A", Some(3.0), Some(10.0)),
      ("B", None, Some(5.0)),
      ("C", None, None))) // group survives; undeclared value doesn't
  }

  test("melt: each value column emits one (metric, val) row") {
    val wide = Seq(("A", 3.0, 30.0), ("B", 5.0, 50.0))
      .toDF("flag", "sum_qty", "sum_price")
    val got = Reshape.melt(wide, Seq("flag"),
      Seq("sum_qty", "sum_price"), "metric", "val")
      .as[(String, String, Double)].collect().toSet
    assert(got == Set(
      ("A", "sum_qty", 3.0), ("A", "sum_price", 30.0),
      ("B", "sum_qty", 5.0), ("B", "sum_price", 50.0)))
  }

  test("pivot equals the conditional-aggregate formulation on lineitem") {
    val li = spark.read.parquet(s"${TestSpark.Sf0001}/lineitem.parquet")
    val fast = Reshape.pivot(li, Seq("l_returnflag"), "l_linestatus",
      Seq("F", "O"),
      sum(col("l_quantity").cast("decimal(18,2)")).cast("double"))
    val ref = li.groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("l_linestatus") === "F",
          col("l_quantity").cast("decimal(18,2)"))).cast("double")
          .as("F"),
        sum(when(col("l_linestatus") === "O",
          col("l_quantity").cast("decimal(18,2)"))).cast("double")
          .as("O"))
    assert(fast.exceptAll(ref).isEmpty && ref.exceptAll(fast).isEmpty)
  }
}
