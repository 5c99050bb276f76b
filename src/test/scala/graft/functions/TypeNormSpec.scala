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

  test("mysqlDateTime: declared fsp pins the wire decode exactly") {
    // 2×10¹² sits in the heuristic's millis band (→ 2033) but as a
    // MicroTimestamp it is Jan 1970 — a declared fsp resolves it
    val out = Seq("2000000000000").toDF("d").select(
      TypeNorm.mysqlDateTime($"d", Some(3)).cast("string").as("m3"),
      TypeNorm.mysqlDateTime($"d", Some(6)).cast("string").as("m6"),
      TypeNorm.mysqlDateTime($"d").cast("string").as("h")).collect()(0)
    assert(out.getString(0).startsWith("2033-")) // fsp<=3 -> millis
    assert(out.getString(1).startsWith("1970-01-24")) // fsp>3 -> micros
    assert(out.getString(2) == out.getString(0)) // unknown -> heuristic
  }

  test("connectDecimal auto: digit-only base64 no longer misreads (ADVICE)") {
    import org.apache.spark.sql.types.DecimalType
    // "1234" is the base64 of the 3-byte unscaled -2658824: on a
    // scale-2 column the numeric fast path now requires a '.', so the
    // precise decode wins; real plain strings still fast-path
    val out = Seq("1234", "-26588.24", "26588.24").toDF("d")
      .select(TypeNorm.connectDecimal($"d", DecimalType(10, 2))
        .cast("string").as("v")).as[String].collect()
    assert(out.toSeq == Seq("-26588.24", "-26588.24", "26588.24"))
    // scale-0 targets keep the plain-numeric preference (engine feeds)
    val z = Seq("1000").toDF("d")
      .select(TypeNorm.connectDecimal($"d", DecimalType(10, 0))
        .cast("string").as("v")).as[String].collect()
    assert(z.toSeq == Seq("1000"))
  }

  test("connectDecimal: explicit precise/numeric modes override sniffing") {
    import org.apache.spark.sql.types.DecimalType
    val t = DecimalType(10, 2)
    val p = Seq("1234").toDF("d")
      .select(TypeNorm.connectDecimal($"d", t, TypeNorm.DecimalModePrecise)
        .cast("string").as("v")).as[String].collect()
    assert(p.toSeq == Seq("-26588.24"))
    val n = Seq("1234").toDF("d")
      .select(TypeNorm.connectDecimal($"d", t, TypeNorm.DecimalModeNumeric)
        .cast("string").as("v")).as[String].collect()
    assert(n.toSeq == Seq("1234.00"))
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
