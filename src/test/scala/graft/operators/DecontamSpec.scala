package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** n-gram benchmark decontamination on a hand-built corpus with known
  * overlaps: exact matched/overlap values, threshold behavior on both
  * arms (minMatched OR minOverlap), self-match exclusion, and the
  * clean-corpus zero case. */
class DecontamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  // 3-grams are whitespace-token trigrams; doc 1 shares exactly its
  // first sentence with bench 101, doc 2 is a verbatim bench copy,
  // doc 3 is clean
  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "exact copy of a benchmark question lives here verbatim"),
    (3L, "completely original content with no benchmark overlap at all")
  ).toDF("doc_id", "text")

  private lazy val bench = Seq(
    (101L, "the quick brown fox jumps over a different ending"),
    (102L, "exact copy of a benchmark question lives here verbatim")
  ).toDF("bench_id", "text")

  test("overlapPairs reports exact shared-ngram counts") {
    val pairs = Decontam.overlapPairs(docs, bench, "doc_id", "text",
        "bench_id", "text", n = 3)
      .select("doc_id", "bench_id", "matched", "n_ngrams")
      .as[(Long, Long, Long, Long)].collect().toSet
    // doc 1: tokens 10 -> 8 distinct trigrams; shares the 4 trigrams of
    // "the quick brown fox jumps over" with bench 101
    assert(pairs.contains((1L, 101L, 4L, 8L)))
    // doc 2: verbatim copy -> all 7 trigrams match bench 102
    assert(pairs.contains((2L, 102L, 7L, 7L)))
    // doc 3 collides with nothing
    assert(!pairs.exists(_._1 == 3L))
  }

  test("flag: matched threshold, overlap threshold, clean doc") {
    val f = Decontam.flag(docs, bench, "doc_id", "text", "bench_id",
        "text", n = 3, minMatched = 5L, minOverlap = 0.9)
      .as[(Long, Double, Long, Int)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1: 4 matches (< 5) and overlap 0.5 (< 0.9) -> clean
    assert(f(1L) == ((1L, 0.5, 4L, 0)))
    // doc 2: full overlap trips BOTH arms
    assert(f(2L) == ((2L, 1.0, 7L, 1)))
    // doc 3: no collisions at all
    assert(f(3L) == ((3L, 0.0, 0L, 0)))
    // single-arm trip: minMatched=4 flags doc 1 even at minOverlap=1.0
    val byCount = Decontam.flag(docs, bench, "doc_id", "text",
        "bench_id", "text", n = 3, minMatched = 4L, minOverlap = 1.0)
      .filter("doc_id = 1").as[(Long, Double, Long, Int)].head()
    assert(byCount._4 == 1)
  }

  test("a doc sharing its id with a bench doc is not self-matched") {
    val selfBench = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("bench_id", "text")
    val f = Decontam.flag(docs, selfBench, "doc_id", "text", "bench_id",
        "text", n = 3, minMatched = 1L)
      .filter("doc_id = 1").as[(Long, Double, Long, Int)].head()
    assert(f == ((1L, 0.0, 0L, 0)))
  }

  test("clean corpus: empty pair frame, nothing flagged") {
    val cleanBench = Seq((201L, "zero shared trigrams with any doc"))
      .toDF("bench_id", "text")
    assert(Decontam.overlapPairs(docs, cleanBench, "doc_id", "text",
      "bench_id", "text", n = 3).count() == 0)
    assert(Decontam.flag(docs, cleanBench, "doc_id", "text", "bench_id",
      "text", n = 3).filter("contaminated = 1").count() == 0)
  }

  test("flagBloom: wide filter agrees with the exact counts") {
    // ~30 set bits in 2^16 -> P(3-probe false positive) ~ 1e-10: the
    // bloom count must equal the exact inverted-index count here
    val f = Decontam.flagBloom(docs, bench.select("text"), "doc_id",
        "text", "text", n = 3, mBits = 1 << 16, k = 3,
        minMatched = 5L, minOverlap = 0.9)
      .as[(Long, Long, Long, Long, Int)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1: 8 trigrams, 4 shared; neither threshold arm trips
    assert(f(1L) == ((1L, 8L, 4L, 4L, 0)))
    // doc 2: verbatim bench copy -> full overlap trips the ratio arm
    // (flagBloom has no pair identity, so bench members DO self-match)
    assert(f(2L) == ((2L, 7L, 7L, 7L, 1)))
    // doc 3: clean (9 tokens -> 7 trigrams)
    assert(f(3L) == ((3L, 7L, 0L, 0L, 0)))
  }

  test("flagBloom: one-sided under a saturated tiny filter") {
    // m=64 bits holding ~30 positions -> false positives all over;
    // the guarantee that must survive is bloom >= exact, never <
    val f = Decontam.flagBloom(docs, bench.select("text"), "doc_id",
        "text", "text", n = 3, mBits = 64, k = 2,
        minMatched = 5L, minOverlap = 0.9)
      .as[(Long, Long, Long, Long, Int)].collect()
    assert(f.nonEmpty)
    f.foreach { case (id, n, bloom, exact, _) =>
      assert(bloom >= exact, s"doc $id: bloom $bloom < exact $exact")
      assert(bloom <= n, s"doc $id: bloom $bloom > n_ngrams $n")
    }
    // monotone flags: anything the exact rule catches, bloom catches
    f.foreach { case (id, n, bloom, exact, contaminated) =>
      val exactFlag = exact >= 5L || (n > 0 && exact.toDouble / n >= 0.9)
      if (exactFlag) assert(contaminated == 1,
        s"doc $id exact-contaminated but bloom missed it")
    }
  }

  test("bloomPos: k probe positions stay in [0, m)") {
    import org.apache.spark.sql.functions.{col, expr}
    val hs = spark.range(1000)
      .select(expr("conv(substring(md5(cast(id as string)), 1, 15), 16, 10)")
        .cast("long").as("h"))
    (0 until 3).foreach { j =>
      val bad = hs.select(Decontam.bloomPos(col("h"), j, 4096).as("p"))
        .filter(col("p") < 0 || col("p") >= 4096).count()
      assert(bad == 0, s"probe $j out of range")
    }
  }

  test("flagBloom rejects a non-power-of-two width") {
    intercept[IllegalArgumentException] {
      Decontam.flagBloom(docs, bench.select("text"), "doc_id", "text",
        "text", n = 3, mBits = 1000)
    }
  }

  test("flagEmbed: identical and near vectors flag, orthogonal do not; " +
      "self-pairs excluded") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),   // identical to bench 10
      (2L, Seq(0.9f, 0.1f, 0.0f)),   // near bench 10
      (3L, Seq(0.0f, 0.0f, 1.0f)),   // orthogonal to the whole bench
      (10L, Seq(1.0f, 0.0f, 0.0f))   // IS bench 10: must not self-match
    ).toDF("vec_id", "embedding")
    val bench = corpus.filter($"vec_id" === 10L)
      .select($"vec_id".as("bid"), $"embedding")
    val got = Decontam.flagEmbed(corpus, bench, "vec_id", "embedding",
        "bid", "embedding", threshold = 0.9)
      .as[(Long, Double, Int)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(got(1L) == ((1.0, 1)))
    assert(got(2L)._2 == 1 && got(2L)._1 > 0.9)
    assert(got(3L) == ((0.0, 0)))
    // vec 10 compared only against the REST of the bench (none) — no
    // row rather than a trivial self-similarity 1.0
    assert(!got.contains(10L))
  }

  test("flagEmbed plans the bench side as a broadcast") {
    val corpus = (1 to 50).map(i => (i.toLong, Seq(i.toFloat, 1.0f)))
      .toDF("vec_id", "embedding")
    val bench = corpus.limit(5)
      .select($"vec_id".as("bid"), $"embedding")
    val plan = Decontam.flagEmbed(corpus, bench, "vec_id", "embedding",
        "bid", "embedding", threshold = 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }
}
