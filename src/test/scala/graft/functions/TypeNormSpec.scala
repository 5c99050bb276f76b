package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TypeNormSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  test("enumLabel: 1-based index, out-of-range -> empty string") {
    val out = Seq(0L, 1L, 3L, 4L).toDF("i")
      .select(TypeNorm.enumLabel($"i", Seq("a", "b", "c")).as("e"))
      .as[String].collect()
    assert(out.toSeq == Seq("", "a", "c", ""))
  }

  test("setLabels: bitmask decodes to comma-joined members") {
    val out = Seq(0L, 1L, 5L, 7L).toDF("m")
      .select(TypeNorm.setLabels($"m", Seq("x", "y", "z")).as("s"))
      .as[String].collect()
    assert(out.toSeq == Seq("", "x", "x,z", "x,y,z"))
  }

  test("bitToLong: dump-string and binlog representations") {
    val out = Seq("", "\u0001", "0", "1").toDF("b")
      .select(TypeNorm.bitToLong($"b").as("v")).as[Long].collect()
    assert(out.toSeq == Seq(0L, 1L, 0L, 1L))
  }

  test("mysqlDate: zero-date sentinel and parse failure -> null") {
    val out = Seq("2024-03-01", "0000-00-00", "garbage").toDF("d")
      .select(TypeNorm.mysqlDate($"d").cast("string").as("v"))
      .collect().map(r => Option(r.getString(0)))
    assert(out.toSeq == Seq(Some("2024-03-01"), None, None))
  }

  test("mysqlDateTime: zero sentinel -> null") {
    val out = Seq("2024-03-01 10:20:30", "0000-00-00 00:00:00").toDF("d")
      .select(TypeNorm.mysqlDateTime($"d").cast("string").as("v"))
      .collect().map(r => Option(r.getString(0)))
    assert(out(0).contains("2024-03-01 10:20:30") && out(1).isEmpty)
  }

  test("csvList and unixSecondsToTs modifiers") {
    val row = Seq(("a,b,c", 1500000000L)).toDF("l", "ts")
      .select(TypeNorm.csvList($"l").as("arr"),
        TypeNorm.unixSecondsToTs($"ts").cast("string").as("t"))
      .collect()(0)
    assert(row.getSeq[String](0) == Seq("a", "b", "c"))
    assert(row.getString(1) == "2017-07-14 02:40:00")
  }
}
