package graft.operators

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  /** Naive inequality-join reference (fine at test scale). */
  private def naive(l: DataFrame, r: DataFrame, lower: Long,
      upper: Long): Set[(Long, Long)] =
    l.as("l").join(r.as("r"),
        $"l.k" === $"r.k" &&
          $"r.ts" > $"l.ts" + lower && $"r.ts" <= $"l.ts" + upper)
      .select($"l.id", $"r.id").as[(Long, Long)].collect().toSet

  private def bucketed(l: DataFrame, r: DataFrame, lower: Long,
      upper: Long): Set[(Long, Long)] =
    RangeJoin.intervalJoin(l, r, Seq("k"), "ts", "ts", lower, upper)
      .select($"l_id", $"r_id").as[(Long, Long)].collect().toSet

  private def randDf(seed: Int, n: Int): DataFrame = {
    val rnd = new Random(seed)
    (1 to n).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "ts", "id")
  }

  test("bucketed interval join == naive inequality join (random data)") {
    val l = randDf(1, 120)
    val r = randDf(2, 120)
    for ((lo, hi) <- Seq((0L, 100L), (0L, 37L), (-50L, 50L), (-80L, -10L)))
      assert(bucketed(l, r, lo, hi) == naive(l, r, lo, hi),
        s"mismatch for window ($lo, $hi]")
  }

  test("window bounds are half-open: (ts+lower, ts+upper]") {
    val l = Seq((1L, 100L, 1L)).toDF("k", "ts", "id")
    val r = Seq((1L, 100L, 10L), (1L, 101L, 11L), (1L, 150L, 12L),
      (1L, 151L, 13L)).toDF("k", "ts", "id")
    // (100, 150]: strictly-after lower, inclusive upper
    assert(bucketed(l, r, 0L, 50L) == Set((1L, 11L), (1L, 12L)))
  }

  test("negative timestamps bucket correctly (floor division)") {
    val l = Seq((1L, -100L, 1L)).toDF("k", "ts", "id")
    val r = Seq((1L, -60L, 10L), (1L, -100L, 11L), (1L, 1L, 12L))
      .toDF("k", "ts", "id")
    assert(bucketed(l, r, 0L, 50L) == Set((1L, 10L)))
    assert(naive(l, r, 0L, 50L) == Set((1L, 10L)))
  }

  test("keys never cross: same ts, different key") {
    val l = Seq((1L, 0L, 1L)).toDF("k", "ts", "id")
    val r = Seq((2L, 10L, 10L)).toDF("k", "ts", "id")
    assert(bucketed(l, r, 0L, 50L).isEmpty)
  }

  test("exact bucket math beyond 2^53 (nanosecond-scale timestamps)") {
    // Double division rounds above 2^53 (~9.0e15); epoch-nanos today are
    // ~1.7e18. The `div` (IntegralDivide) path must bucket these exactly:
    // base is chosen so that base and base+width land in adjacent buckets
    // and a rounded double division would merge or shift them.
    val base = 1_700_000_000_000_000_123L // ~1.7e18, not bucket-aligned
    val l = Seq((1L, base, 1L)).toDF("k", "ts", "id")
    val r = Seq(
      (1L, base, 10L),        // excluded: window is strictly-after lower
      (1L, base + 1L, 11L),   // included
      (1L, base + 50L, 12L),  // included: inclusive upper
      (1L, base + 51L, 13L),  // excluded
      (1L, base - 1L, 14L))   // excluded
      .toDF("k", "ts", "id")
    assert(bucketed(l, r, 0L, 50L) == Set((1L, 11L), (1L, 12L)))
    // negative side of the same magnitude
    val ln = Seq((1L, -base, 1L)).toDF("k", "ts", "id")
    val rn = Seq((1L, -base + 25L, 20L), (1L, -base - 25L, 21L))
      .toDF("k", "ts", "id")
    assert(bucketed(ln, rn, 0L, 50L) == Set((1L, 20L)))
  }

  test("no duplicate pairs from the two-bucket left explode") {
    val l = randDf(3, 200)
    val r = randDf(4, 200)
    val rows = RangeJoin.intervalJoin(l, r, Seq("k"), "ts", "ts", 0L, 100L)
      .select($"l_id", $"r_id").as[(Long, Long)].collect()
    assert(rows.length == rows.toSet.size)
  }
}
