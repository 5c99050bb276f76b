package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  test("boundedQuantiles: exact rank selection when the sample is all rows") {
    // values 1..10, k larger than the frame -> sample = everything and
    // quantile q = value at rank ceil(q*10)
    val docs = (1L to 10L).map(i => (i, i * 100)).toDF("doc_id", "v")
    val got = CorpusStats
      .boundedQuantiles(docs, "doc_id", $"v",
        quantiles = Seq(0.1, 0.5, 0.75, 1.0), k = 100)
      .select($"q", $"value", $"n_sample")
      .as[(Double, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((0.1, 100L, 10L), (0.5, 500L, 10L),
      (0.75, 800L, 10L), (1.0, 1000L, 10L)))
  }

  test("boundedQuantiles: k truncates deterministically by id hash") {
    val docs = (1L to 50L).map(i => (i, i)).toDF("doc_id", "v")
    val a = CorpusStats.boundedQuantiles(docs, "doc_id", $"v", k = 8)
      .select($"n_sample").distinct().as[Long].collect()
    assert(a.toSeq == Seq(8L))
    // deterministic: same 8 rows on re-run
    val run1 = CorpusStats.boundedQuantiles(docs, "doc_id", $"v", k = 8)
      .select($"q", $"value").as[(Double, Long)].collect().toSet
    val run2 = CorpusStats.boundedQuantiles(docs, "doc_id", $"v", k = 8)
      .select($"q", $"value").as[(Double, Long)].collect().toSet
    assert(run1 == run2)
  }

  test("boundedQuantiles plans the sample as a distributed top-k") {
    val docs = spark.read
      .parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val plan = CorpusStats.boundedQuantiles(docs, "doc_id",
      CorpusStats.tokenMeasure($"text"))
      .queryExecution.executedPlan.toString
    // orderBy(hash).limit(k) must be TakeOrderedAndProject (per-partition
    // top-k merged on the driver), NOT a global sort
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("lengthHistogram: exact buckets, bounds and sums") {
    val docs = Seq(3L, 7L, 10L, 19L, 25L).map(v => Tuple1(v)).toDF("v")
    val got = CorpusStats.lengthHistogram(docs, $"v", width = 10)
      .select($"bucket", $"lo", $"n_docs", $"min_v", $"max_v", $"sum_v")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(_._1).toSeq
    assert(got == Seq((0L, 0L, 2L, 3L, 7L, 10L),
      (1L, 10L, 2L, 10L, 19L, 29L), (2L, 20L, 1L, 25L, 25L, 25L)))
  }

  private lazy val corrToy = (0 until 200).map { i =>
    val x = i / 200.0
    (x, 2.0 * x + 1.0, -3.0 * x, (i * 37 % 50) / 50.0)
  }.toDF("x", "up", "down", "noise")

  test("exactCorr: perfect linear relations hit ±1, noise does not") {
    val got = CorpusStats.exactCorr(corrToy, Seq(
        "down" -> $"down", "noise" -> $"noise",
        "up" -> $"up", "x" -> $"x"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(got(("up", "x")).contains(1.0))
    assert(got(("down", "x")).contains(-1.0))
    assert(got(("down", "up")).contains(-1.0))
    assert(math.abs(got(("noise", "x")).get) < 0.3)
  }

  test("exactCorr matches the driver-side Pearson formula") {
    val rows = corrToy.select($"x", $"noise")
      .as[(Double, Double)].collect()
    val n = rows.length.toDouble
    val sx = rows.map(_._1).sum; val sy = rows.map(_._2).sum
    val sxx = rows.map(r => r._1 * r._1).sum
    val syy = rows.map(r => r._2 * r._2).sum
    val sxy = rows.map(r => r._1 * r._2).sum
    val want = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    val got = CorpusStats.exactCorr(corrToy,
        Seq("noise" -> $"noise", "x" -> $"x"))
      .head().getDouble(2)
    assert(math.abs(got - want) < 1e-6)
  }

  test("exactCorr is bit-identical across partitionings; constant -> null") {
    val ms = Seq("c" -> lit(5.0), "noise" -> $"noise", "x" -> $"x")
    val a = CorpusStats.exactCorr(corrToy.repartition(1), ms).collect()
    val b = CorpusStats.exactCorr(corrToy.repartition(17), ms).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    val byPair = a.map(r => (r.getString(0), r.getString(1)) -> r.get(2))
      .toMap
    assert(byPair(("c", "noise")) == null)
    assert(byPair(("c", "x")) == null)
    assert(byPair(("noise", "x")) != null)
  }

  test("domainThresholds: with k >= domain size the threshold is the " +
      "exact domain quantile") {
    // domain A scores 1..10, domain B scores 101..104: p=0.5 thresholds
    // are the values at rank ceil(0.5*n) in (score, id) order
    val docs = ((1L to 10L).map(i => ("A", i, i.toDouble)) ++
      (11L to 14L).map(i => ("B", i, (i + 90).toDouble)))
      .toDF("dom", "id", "score")
    val got = CorpusStats
      .domainThresholds(docs, "id", "dom", "score", p = 0.5, k = 100)
      .as[(String, Double, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("A", 5.0, 10L), ("B", 102.0, 4L)))
  }

  test("filterByDomainQuantile keeps each domain's upper half " +
      "independently of the other domain's scale") {
    // every B score dwarfs every A score; a global cutoff would drop
    // all of A, the relative filter keeps A's top half
    val docs = ((1L to 10L).map(i => ("A", i, i.toDouble)) ++
      (11L to 20L).map(i => ("B", i, (i * 100).toDouble)))
      .toDF("dom", "id", "score")
    val kept = CorpusStats.filterByDomainQuantile(docs, "id", "dom",
        col("score"), p = 0.5, k = 100)
      .select("dom", "id").as[(String, Long)].collect().toSet
    assert(kept.count(_._1 == "A") == 6) // ranks 5..10 (>= rank-5 score)
    assert(kept.count(_._1 == "B") == 6)
    assert(kept.contains(("A", 10L)) && !kept.contains(("A", 1L)))
  }

  test("domainThresholds: sub-bucketed sample rank equals the plain " +
      "per-domain rank (two-level top-k is exact)") {
    val docs = (1L to 500L).map(i => (s"d${i % 3}", i, (i % 37).toDouble))
      .toDF("dom", "id", "score")
    val twoLevel = CorpusStats
      .domainThresholds(docs, "id", "dom", "score", p = 0.7, k = 32,
        subParts = 16)
      .as[(String, Double, Long)].collect().toSet
    val oneLevel = CorpusStats
      .domainThresholds(docs, "id", "dom", "score", p = 0.7, k = 32,
        subParts = 1)
      .as[(String, Double, Long)].collect().toSet
    assert(twoLevel == oneLevel)
    assert(twoLevel.forall(_._3 == 32L))
  }

  test("bucketKlDivergence: zero on identical slices, positive on drift") {
    val a = Seq("apple banana", "apple cherry", "banana cherry")
      .toDF("text")
    val b = Seq("rock stone", "rock granite", "stone granite").toDF("text")
    // identical slices: every ratio is exactly 1 -> contrib exactly 0
    val same = CorpusStats.bucketKlDivergence(a, a, "text", buckets = 32)
      .as[(Long, Long, Long, Double)].collect()
    assert(same.nonEmpty && same.forall(_._4 == 0.0))
    // drifted slices: total KL strictly positive, every bucket present
    // in either slice appears, counts are the exact token counts
    val drift = CorpusStats
      .bucketKlDivergence(a, a.unionByName(b), "text", buckets = 32)
      .as[(Long, Long, Long, Double)].collect()
    assert(drift.length == 32) // DENSE — absent buckets carry smoothing
    assert(drift.map(_._4).sum > 0.0) // Gibbs holds only on the dense sum
    assert(drift.map(_._2).sum == 6L)  // p tokens
    assert(drift.map(_._3).sum == 12L) // q tokens
    // partitioning invariance (exact integer counts + per-row chain)
    val again = CorpusStats
      .bucketKlDivergence(a.repartition(5), a.unionByName(b).repartition(3),
        "text", buckets = 32)
      .as[(Long, Long, Long, Double)].collect()
    assert(drift.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("groupEntropy: exact counts, uniform max, single-value zero") {
    val df = Seq(
      // u1: 2×a, 2×b — uniform over 2 values → H = ln 2, each
      // contribution exactly round(0.5·ln 2, 9)
      (1L, "a"), (1L, "a"), (1L, "b"), (1L, "b"),
      // u2: only a → frac 1, contribution must be EXACTLY 0.0 (not
      // -0.0: the canonical comparator stringifies doubles)
      (2L, "a"), (2L, "a"),
      // u3: 3×a, 1×b
      (3L, "a"), (3L, "a"), (3L, "a"), (3L, "b"))
      .toDF("u", "v")
    val got = CorpusStats.groupEntropy(df, "u", "v")
      .as[(Long, String, Long, Long, Double)].collect()
      .map(r => ((r._1, r._2), (r._3, r._4, r._5))).toMap
    def h(c: Long, n: Long): Double = {
      val f = c.toDouble / n.toDouble
      BigDecimal(-f * math.log(f))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got((1L, "a")) == ((2L, 4L, h(2, 4))))
    assert(got((1L, "b")) == ((2L, 4L, h(2, 4))))
    assert(got((3L, "a")) == ((3L, 4L, h(3, 4))))
    assert(got((3L, "b")) == ((1L, 4L, h(1, 4))))
    // single-value group: zero entropy, rendered 0.0 not -0.0
    val (c2, n2, h2) = got((2L, "a"))
    assert((c2, n2) == ((2L, 2L)) && h2 == 0.0 &&
      h2.toString == "0.0")
    // u1 uniform: total entropy ln 2 within rounding
    val u1 = got((1L, "a"))._3 + got((1L, "b"))._3
    assert(math.abs(u1 - math.log(2)) < 2e-9)
  }
}
