package graft.functions

import graft.TestSpark
import graft.functions.expr.{HashExprUtils, HllSketch}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class HllSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  /** Driver-side register reference: identical hash, identical integer
    * math (j = h mod m, ρ = (60−p) − bitlength(w) + 1, t = Σ 2^(R−Mⱼ)). */
  private def reference(values: Seq[String], p: Int): (Long, Int) = {
    val m = 1 << p
    val maxRank = 60 - p + 1
    val regs = new Array[Int](m)
    values.foreach { v =>
      val h = HashExprUtils.hash60(UTF8String.fromString(v))
      val j = (h % m).toInt
      val w = h / m
      val rho =
        if (w == 0L) maxRank
        else 60 - p - (64 - java.lang.Long.numberOfLeadingZeros(w)) + 1
      if (rho > regs(j)) regs(j) = rho
    }
    val t = regs.map(r => 1L << (maxRank - r)).sum
    (t, regs.count(_ == 0))
  }

  private def sketch(values: Seq[String], p: Int,
      parts: Int = 4): (Long, Int) = {
    val r = values.toDF("v").repartition(parts)
      .agg(call_function("hll_sketch", col("v"), lit(p)).as("h"))
      .select(col("h.t"), col("h.zeros")).head()
    (r.getLong(0), r.getInt(1))
  }

  test("registers are bit-identical to the sequential reference") {
    val vals = (1 to 5000).map(i => s"user_${i % 1200}")
    for (p <- Seq(4, 6, 8))
      assert(sketch(vals, p) == reference(vals, p), s"p=$p")
  }

  test("partitioning-invariant (merge is an elementwise max)") {
    val vals = (1 to 3000).map(i => s"k$i")
    val expected = sketch(vals, 6, parts = 1)
    for (parts <- Seq(2, 7, 32))
      assert(sketch(vals, 6, parts) == expected, s"parts=$parts")
  }

  test("duplicates and nulls do not move the registers") {
    val vals = Seq("a", "b", "c")
    val dups = vals ++ vals ++ vals
    assert(sketch(dups, 6) == sketch(vals, 6))
    val withNull = Seq(Some("a"), None, Some("b"), Some("c"), None)
    val got = withNull.toDF("v")
      .agg(call_function("hll_sketch", col("v"), lit(6)).as("h"))
      .select(col("h.t"), col("h.zeros")).head()
    assert((got.getLong(0), got.getInt(1)) == sketch(vals, 6))
  }

  test("empty input: all registers empty, t = m * 2^maxRank") {
    val (t, zeros) = sketch(Seq.empty[String], 6)
    assert(zeros == 64)
    assert(t == 64L * (1L << 55))
  }

  test("estimate from t lands within HLL's error bound") {
    // σ ≈ 1.04/√m = 13% at m=64; 5000 distinct keys, assert within 3σ
    val vals = (1 to 5000).map(i => s"user_$i")
    val (t, _) = sketch(vals, 6)
    val est = HllSketch.alpha(6) * 4096.0 * 3.6028797018963968e16 / t.toDouble
    assert(math.abs(est - 5000.0) / 5000.0 < 0.39,
      s"estimate $est too far from 5000")
  }

  test("grouped sketch: per-group registers independent") {
    val df = (1 to 2000).map(i => (s"g${i % 3}", s"v${i % 500}"))
      .toDF("g", "v")
    val got = df.groupBy("g")
      .agg(call_function("hll_sketch", col("v"), lit(6)).as("h"))
      .select(col("g"), col("h.t"), col("h.zeros"))
      .collect().map { case Row(g: String, t: Long, z: Int) => g -> (t, z) }
      .toMap
    val byGroup = (1 to 2000).map(i => (s"g${i % 3}", s"v${i % 500}"))
      .groupBy(_._1).map { case (g, vs) => g -> reference(vs.map(_._2), 6) }
    assert(got == byGroup)
  }

  test("p out of range rejected") {
    intercept[Exception] { sketch(Seq("a"), 3) }
    intercept[Exception] { sketch(Seq("a"), 13) }
  }
}
