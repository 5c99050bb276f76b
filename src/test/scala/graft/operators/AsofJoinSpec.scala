package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  // quotes: (key, ts, qid, px) — two keys, out-of-order insert, ties
  private lazy val quotes = Seq(
    ("a", 10L, 1L, 1.0), ("a", 20L, 2L, 2.0), ("a", 20L, 3L, 3.0),
    ("a", 40L, 4L, 4.0),
    ("b", 15L, 5L, 5.0)
  ).toDF("k", "rts", "qid", "px")

  // trades: (key, ts, tid)
  private lazy val trades = Seq(
    ("a", 5L, 100L),  // before any quote
    ("a", 20L, 101L), // tied with quotes 2 and 3
    ("a", 25L, 102L), // between
    ("a", 99L, 103L), // after all
    ("b", 15L, 104L), // exact tie
    ("c", 50L, 105L)  // key with no quotes
  ).toDF("k", "lts", "tid")

  private def backward = AsofJoin.asof(trades, quotes, Seq("k"),
    "lts", "rts", Seq("qid", "px"), tiebreak = "qid")

  test("backward as-of picks the latest quote at-or-before each trade") {
    val got = backward.select("tid", "r_qid").as[(Long, Option[Long])]
      .collect().toMap
    assert(got(100L).isEmpty)        // nothing before ts=5
    assert(got(101L).contains(3L))   // tie at ts=20 -> greatest qid wins
    assert(got(102L).contains(3L))
    assert(got(103L).contains(4L))
    assert(got(104L).contains(5L))   // equal ts is visible
    assert(got(105L).isEmpty)        // no quotes for key c
  }

  test("every left row survives exactly once, with its own columns") {
    val out = backward.collect()
    assert(out.length == trades.count())
    val cols = backward.columns.toSeq
    assert(cols == Seq("k", "lts", "tid", "r_qid", "r_px", "r_rts"))
  }

  test("forward as-of picks the earliest quote at-or-after each trade") {
    val got = AsofJoin.asof(trades, quotes, Seq("k"), "lts", "rts",
      Seq("qid", "px"), tiebreak = "qid", forward = true)
      .select("tid", "r_qid").as[(Long, Option[Long])].collect().toMap
    assert(got(100L).contains(1L))
    // forward at equal ts: visible; greatest tiebreak among ties wins
    assert(got(101L).contains(3L))
    assert(got(102L).contains(4L))
    assert(got(103L).isEmpty)        // nothing at-or-after ts=99
    assert(got(104L).contains(5L))
    assert(got(105L).isEmpty)
  }

  test("matched payload carries the right row's values") {
    val r = backward.filter($"tid" === 103L)
      .select("r_qid", "r_px", "r_rts").as[(Long, Double, Long)].head()
    assert(r == ((4L, 4.0, 40L)))
  }

  test("caller columns that look like working columns are fine; " +
      "actual _gaj_ collisions fail loudly") {
    // a caller column literally named _ts / _tag must NOT break the
    // union (the old failure mode ADVICE flagged for two rounds)
    val l = trades.withColumnRenamed("lts", "_ts")
      .withColumn("_tag", $"tid" % 2)
    val got = AsofJoin.asof(l, quotes, Seq("k"), "_ts", "rts",
      Seq("qid"), tiebreak = "qid")
      .select("tid", "r_qid").as[(Long, Option[Long])].collect().toMap
    assert(got(101L).contains(3L) && got(105L).isEmpty)
    // the reserved prefix itself is rejected with a clear message
    val bad = trades.withColumn("_gaj_ts", $"lts")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asof(bad, quotes, Seq("k"), "lts", "rts",
        Seq("qid"), tiebreak = "qid")
    }
    assert(e.getMessage.contains("_gaj_"))
  }

  // deterministic pseudo-random workload shared by the bucketed tests:
  // hot key "h" emits densely over a long span, others sparsely
  private def lcg(seed: Long): LongStream = {
    var s = seed
    () => { s = (s * 6364136223846793005L + 1442695040888963407L); s }
  }
  private type LongStream = () => Long
  private lazy val skewLeft = {
    val r = lcg(7)
    (1 to 400).map { i =>
      val k = if (i % 4 != 0) "h" else "k" + (math.abs(r()) % 3)
      (k, math.abs(r()) % 10000L, i.toLong)
    }.toDF("k", "lts", "tid")
  }
  private lazy val skewRight = {
    val r = lcg(13)
    (1 to 300).map { i =>
      val k = if (i % 3 != 0) "h" else "k" + (math.abs(r()) % 3)
      (k, math.abs(r()) % 10000L, 1000L + i, i * 1.5)
    }.toDF("k", "rts", "qid", "px")
  }

  test("asofBucketed == asof on a skewed workload, both directions") {
    for (fwd <- Seq(false, true); width <- Seq(100L, 1000L, 100000L)) {
      val plain = AsofJoin.asof(skewLeft, skewRight, Seq("k"),
        "lts", "rts", Seq("qid", "px"), tiebreak = "qid", forward = fwd)
      val bucketed = AsofJoin.asofBucketed(skewLeft, skewRight, Seq("k"),
        "lts", "rts", Seq("qid", "px"), tiebreak = "qid", forward = fwd,
        bucketWidth = width)
      assert(bucketed.count() == skewLeft.count())
      val diff = plain.exceptAll(bucketed).count() +
        bucketed.exceptAll(plain).count()
      assert(diff == 0, s"forward=$fwd width=$width diverged")
    }
  }

  test("asofBucketed edge semantics: ties, equal-ts visibility, " +
      "carry across empty buckets") {
    // quotes at 10,20,20,40 with width 16 put trade 99 several empty
    // buckets past the last quote — the carry must still arrive
    val got = AsofJoin.asofBucketed(trades, quotes, Seq("k"),
      "lts", "rts", Seq("qid", "px"), tiebreak = "qid", bucketWidth = 16L)
      .select("tid", "r_qid").as[(Long, Option[Long])].collect().toMap
    assert(got(100L).isEmpty)
    assert(got(101L).contains(3L)) // tie at 20: greatest qid, cross-check
    assert(got(102L).contains(3L))
    assert(got(103L).contains(4L)) // carried over buckets (40..99)/16
    assert(got(104L).contains(5L)) // equal ts visible
    assert(got(105L).isEmpty)
  }

  test("asofBucketed splits a hot key across buckets in the plan") {
    val bucketed = AsofJoin.asofBucketed(skewLeft, skewRight, Seq("k"),
      "lts", "rts", Seq("qid", "px"), tiebreak = "qid",
      bucketWidth = 1000L)
    val plan = bucketed.queryExecution.executedPlan.toString
    // the data-sized window must partition by (k, bucket), not k alone:
    // its spec appears as "partitionBy [k..., _gaj_bkt...]" in the plan
    assert(plan.contains("_gaj_bkt"), plan)
    // and the hot key genuinely spans many buckets at this width
    val hotBuckets = skewLeft.filter($"k" === "h")
      .selectExpr("cast(lts div 1000 as long) b").distinct().count()
    assert(hotBuckets > 5)
  }

  test("asofBucketed EXECUTES a hot key on >1 task; plain asof on exactly 1") {
    // 90% of rows on one key, spanning 16 one-"second" buckets: the
    // claim under test is execution spread, not data math — count which
    // PHYSICAL partitions of the final stage hold the hot key's output.
    // The data-sized window partitions by (key, bucket) and nothing
    // reshuffles after it, so output partitions ARE the sort tasks.
    // AQE would coalesce these small test partitions into one and mask
    // the spread, so it is pinned off for this test only.
    val n = 40000
    val hotL = (1 to n * 9 / 10).map(i =>
      ("h", (i.toLong * 16000L * 10 / (n * 9 / 10)) % 16000L, i.toLong))
    val coldL = (1 to n / 10).map(i =>
      ("c" + (i % 37), (i * 401L) % 16000L, (n + i).toLong))
    val left = (hotL ++ coldL).toDF("k", "lts", "tid")
    val right = (1 to 4000).map(i =>
      (if (i % 10 != 0) "h" else "c" + (i % 37),
        (i * 379L) % 16000L, i.toLong, i * 0.5)).toDF("k", "rts", "qid", "px")

    val adaptiveWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // full rows, not select("k"): projecting the key alone lets the
      // optimizer prune the window (and its exchange) out of the plan,
      // and the partition count observed would be the input's
      def hotTaskCount(df: org.apache.spark.sql.DataFrame): Int =
        df.rdd.mapPartitionsWithIndex { case (i, it) =>
          if (it.exists(_.getAs[String]("k") == "h")) Iterator(i)
          else Iterator.empty
        }.distinct().count().toInt

      def timed[A](a: => A): (A, Double) = {
        val t0 = System.nanoTime(); val r = a
        (r, (System.nanoTime() - t0) / 1e9)
      }
      val (plainTasks, tPlain) = timed(hotTaskCount(
        AsofJoin.asof(left, right, Seq("k"), "lts", "rts",
          Seq("qid", "px"), tiebreak = "qid")))
      val (bucketTasks, tBucket) = timed(hotTaskCount(
        AsofJoin.asofBucketed(left, right, Seq("k"), "lts", "rts",
          Seq("qid", "px"), tiebreak = "qid", bucketWidth = 1000L)))

      // per-key partitioning concentrates the hot key on ONE task;
      // (key, bucket) partitioning spreads it over its 16 buckets
      assert(plainTasks == 1,
        s"plain asof put the hot key on $plainTasks tasks")
      assert(bucketTasks > 1,
        s"bucketed asof left the hot key on $bucketTasks task(s)")
      info(f"hot-key tasks: plain=$plainTasks bucketed=$bucketTasks; " +
        f"wall: plain=$tPlain%.2fs bucketed=$tBucket%.2fs " +
        f"(shared-host timing, informational)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", adaptiveWas)
  }
}
