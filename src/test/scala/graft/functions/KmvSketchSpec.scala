package graft.functions

import graft.TestSpark
import graft.functions.expr.{HashExprUtils, KmvSketch}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class KmvSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  /** Driver-side reference: identical hash, identical estimate math. */
  private def reference(values: Seq[String], k: Int): Double = {
    val hs = values.map(v =>
      HashExprUtils.hash60(UTF8String.fromString(v))).distinct.sorted
    if (hs.size < k) hs.size.toDouble
    else ((k - 1).toDouble * KmvSketch.Two60) / hs(k - 1).toDouble
  }

  private def sketch(values: Seq[String], k: Int, parts: Int = 4): Double =
    values.toDF("v").repartition(parts)
      .agg(call_function("kmv_distinct", col("v"), lit(k)))
      .as[Double].head()

  test("exact count below k (duplicates and nulls collapse)") {
    val vals = Seq("a", "b", "c", "a", "b", "c", "c")
    assert(sketch(vals, k = 64) == 3.0)
    val withNulls = Seq(Some("a"), None, Some("b"), None)
    val got = withNulls.toDF("v")
      .agg(call_function("kmv_distinct", col("v"), lit(64)))
      .as[Double].head()
    assert(got == 2.0)
  }

  test("estimate is bit-identical to the sequential reference") {
    val vals = (1 to 5000).map(i => s"user_${i % 1200}")
    for (k <- Seq(16, 64, 256))
      assert(sketch(vals, k) == reference(vals.distinct, k), s"k=$k")
  }

  test("partial-aggregation merge is order/partitioning independent") {
    val vals = (1 to 3000).map(i => s"v$i")
    val expect = sketch(vals, 64, parts = 1)
    for (p <- Seq(2, 7, 32))
      assert(sketch(vals, 64, parts = p) == expect, s"parts=$p")
  }

  test("estimate lands within the KMV error envelope") {
    val n = 20000
    val vals = (1 to n).map(i => s"item_$i")
    val k = 256
    val est = sketch(vals, k)
    // std err ~ 1/sqrt(k-2) ~ 6.3%; allow 5 sigma
    assert(math.abs(est - n) / n < 0.32, s"estimate $est vs $n")
  }

  test("grouped estimates: one sketch per group, exact when small") {
    val df = (1 to 1000).map(i => (s"g${i % 3}", s"u${i % 40}"))
      .toDF("g", "v")
    val got = df.groupBy("g")
      .agg(call_function("kmv_distinct", col("v"), lit(64)).as("nd"))
      .as[(String, Double)].collect().toMap
    // 40 distinct users spread mod 3: each group sees a fixed subset
    assert(got.values.forall(v => v > 0 && v <= 40))
    assert(got.keySet == Set("g0", "g1", "g2"))
  }

  test("non-string input is rejected at analysis") {
    val ex = intercept[Exception] {
      Seq(1, 2, 3).toDF("v")
        .agg(call_function("kmv_distinct", col("v"), lit(8))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("string") ||
      ex.getMessage.contains("kmv_distinct"))
  }

  private def kset(values: Seq[String], k: Int, parts: Int = 4): Seq[Long] =
    values.toDF("v").repartition(parts)
      .agg(call_function("kmv_set", col("v"), lit(k)))
      .as[Seq[Long]].head()

  test("kmv_set returns the k smallest hashes, sorted ascending") {
    val vals = (1 to 2000).map(i => s"u$i")
    val all = vals.map(v =>
      HashExprUtils.hash60(UTF8String.fromString(v))).distinct.sorted
    assert(kset(vals, 64) == all.take(64))
    // below k: the complete (exact) hash set
    assert(kset(vals.take(10), 64) == all.intersect(
      vals.take(10).map(v =>
        HashExprUtils.hash60(UTF8String.fromString(v)))).sorted)
  }

  test("kmv_set is closed under union: merging two group sketches " +
      "equals sketching the union") {
    val a = (1 to 1500).map(i => s"a$i")
    val b = (1 to 1500).map(i => s"b$i")
    val merged = (kset(a, 64) ++ kset(b, 64)).distinct.sorted.take(64)
    assert(merged == kset(a ++ b, 64))
  }

  test("sketch-algebra union and intersection estimates track the truth") {
    // |A|=1200, |B|=1000, |A∩B|=400 -> |A∪B|=1800
    val a = (1 to 1200).map(i => s"k$i")
    val b = (801 to 1800).map(i => s"k$i")
    val (sa, sb) = (kset(a, 256), kset(b, 256))
    val merged = (sa ++ sb).distinct.sorted
    val mk = merged.take(256)
    val ue = 255.0 * KmvSketch.Two60 / mk.last.toDouble
    val common = mk.count(h => sa.contains(h) && sb.contains(h))
    val ie = common.toDouble / mk.size * ue
    assert(math.abs(ue - 1800.0) / 1800.0 < 0.2, s"union est $ue")
    assert(math.abs(ie - 400.0) / 400.0 < 0.35, s"inter est $ie")
  }
}
