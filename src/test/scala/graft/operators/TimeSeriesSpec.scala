package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  // u1: active Jan 1 (twice) and Jan 4 — gap days 2,3 must appear as
  // zeros; u2: single-day key — exactly one row, no fill; u3: active
  // on two consecutive days — no gap rows.
  private lazy val ev = Seq(
    (1L, "2024-01-01 10:00:00", 2.5), (1L, "2024-01-01 11:00:00", 1.5),
    (1L, "2024-01-04 09:00:00", 3.0),
    (2L, "2024-02-10 12:00:00", 7.25),
    (3L, "2024-03-01 08:00:00", 1.0), (3L, "2024-03-02 08:00:00", 2.0)
  ).toDF("u", "ts_s", "v")
    .selectExpr("u", "CAST(ts_s AS TIMESTAMP) AS ts", "v")

  private lazy val got = TimeSeries.gapFillDaily(ev, "u", "ts", "v")
    .select(col("u"), col("day").cast("string"), col("n_events"),
      col("sum_value"))
    .as[(Long, String, Long, Double)].collect().toSet

  test("gaps filled with explicit zeros, active days aggregated") {
    assert(got == Set(
      (1L, "2024-01-01", 2L, 4.0),
      (1L, "2024-01-02", 0L, 0.0),
      (1L, "2024-01-03", 0L, 0.0),
      (1L, "2024-01-04", 1L, 3.0),
      (2L, "2024-02-10", 1L, 7.25),
      (3L, "2024-03-01", 1L, 1.0),
      (3L, "2024-03-02", 1L, 2.0)))
  }

  test("every key is contiguous from first to last active day") {
    val byKey = got.groupBy(_._1)
    byKey.foreach { case (_, rows) =>
      val days = rows.map(_._2).toSeq.sorted
      val span = java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(days.head),
        java.time.LocalDate.parse(days.last))
      assert(days.size.toLong == span + 1, s"holes in $days")
    }
  }

  test("equals the spine-join formulation on the real events table") {
    val real = spark.read.parquet(s"${TestSpark.Sf0001}/events.parquet")
    val typed = real.withColumn("ts",
      graft.sources.EventTs.asTimestamp(real))
    val fast = TimeSeries.gapFillDaily(typed, "user_id", "ts", "value")
    val daily = typed
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("sv"))
    val spine = daily.groupBy(col("user_id"))
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"),
        expr("interval 1 day"))).as("day"))
    val ref = spine.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("sv"), lit(0).cast("decimal(18,2)"))
          .cast("double").as("sum_value"))
    assert(fast.exceptAll(ref).isEmpty && ref.exceptAll(fast).isEmpty)
  }

  test("ohlc: open/close by (ts, tiebreak) total order, exact extremes") {
    // u1 Jan 1: two events at the SAME timestamp — tiebreak decides
    // open (id 1) and close (id 2); plus an earlier/later pair
    val e = Seq(
      (1L, 10L, "2024-01-01 09:00:00", 5.0),
      (1L, 1L, "2024-01-01 12:00:00", 2.5),
      (1L, 2L, "2024-01-01 12:00:00", 9.0),
      (1L, 3L, "2024-01-01 18:00:00", 4.0),
      (2L, 4L, "2024-01-02 01:00:00", 7.0)
    ).toDF("u", "eid", "ts_s", "v")
      .selectExpr("u", "eid", "CAST(ts_s AS TIMESTAMP) AS ts", "v")
    val got = TimeSeries.ohlcDaily(e, "u", "ts", "v", "eid")
      .select(col("u"), col("day").cast("string"), col("open"),
        col("close"), col("low"), col("high"), col("n_events"),
        col("sum_value"))
      .as[(Long, String, Double, Double, Double, Double, Long, Double)]
      .collect().toSet
    assert(got == Set(
      (1L, "2024-01-01", 5.0, 4.0, 2.5, 9.0, 4L, 20.5),
      (2L, "2024-01-02", 7.0, 7.0, 7.0, 7.0, 1L, 7.0)))
  }

  test("rolling: RANGE frame shortens across calendar gaps") {
    // u1 active Jan 1, 4, 12 with a 3-day window: Jan 4 still sees
    // Jan 1? No — window is [day-2, day], so Jan 4 sees only itself;
    // make Jan 3 active instead to prove inclusion, Jan 12 isolation.
    val e = Seq(
      (1L, "2024-01-01 10:00:00", 2.0),
      (1L, "2024-01-03 10:00:00", 3.0),
      (1L, "2024-01-04 10:00:00", 5.0),
      (1L, "2024-01-12 10:00:00", 1.0),
      (2L, "2024-01-03 10:00:00", 9.0)
    ).toDF("u", "ts_s", "v")
      .selectExpr("u", "CAST(ts_s AS TIMESTAMP) AS ts", "v")
    val got = TimeSeries.rollingDaily(e, "u", "ts", "v", 3)
      .select(col("u"), col("day").cast("string"), col("roll_sum"),
        col("roll_events"))
      .as[(Long, String, Double, Long)].collect().toSet
    assert(got == Set(
      (1L, "2024-01-01", 2.0, 1L),          // nothing before
      (1L, "2024-01-03", 5.0, 2L),          // Jan 1 within [1,3]
      (1L, "2024-01-04", 8.0, 2L),          // Jan 1 aged out of [2,4]
      (1L, "2024-01-12", 1.0, 1L),          // isolated — gap > window
      (2L, "2024-01-03", 9.0, 1L)))         // keys never mix
  }

  test("anomalies: spike flagged against a SELF-EXCLUDED baseline") {
    // u1: five flat days (10.0) then a 100.0 spike — only the spike
    // day trips, and its μ/σ come from the five PRIOR days (μ=10,
    // σ=0), proving the day can't vouch for itself. u2: mild wobble
    // stays under 2σ. Short baselines (< 4 days) never flag.
    val rows = (1 to 5).map(d => (1L, f"2024-01-0$d%d 10:00:00", 10.0)) ++
      Seq((1L, "2024-01-06 10:00:00", 100.0),
        (2L, "2024-01-01 10:00:00", 10.0), (2L, "2024-01-02 10:00:00", 12.0),
        (2L, "2024-01-03 10:00:00", 8.0), (2L, "2024-01-04 10:00:00", 10.0),
        (2L, "2024-01-05 10:00:00", 11.0))
    val e = rows.toDF("u", "ts_s", "v")
      .selectExpr("u", "CAST(ts_s AS TIMESTAMP) AS ts", "v")
    val got = TimeSeries.anomalies(e, "u", "ts", "v",
      baselineDays = 14, tau = 2.0, minBaseline = 4)
      .select(col("u"), col("day").cast("string"), col("value"),
        col("mu"), col("sigma"), col("n_base"))
      .as[(Long, String, Double, Double, Double, Long)].collect().toSet
    assert(got == Set((1L, "2024-01-06", 100.0, 10.0, 0.0, 5L)))
  }

  test("trend: exact slope/intercept on a perfect line, singletons dropped") {
    // u1: y = 3·x − 59000 over epoch days 19723..19725 (Jan 1–3 2024)
    // — every moment stays double-exact, so slope/intercept are EXACT.
    // u2: one day only — no line through one point.
    val e = Seq(
      (1L, "2024-01-01 10:00:00", 169.0),
      (1L, "2024-01-02 10:00:00", 172.0),
      (1L, "2024-01-03 10:00:00", 175.0),
      (2L, "2024-01-01 10:00:00", 7.0)
    ).toDF("u", "ts_s", "v")
      .selectExpr("u", "CAST(ts_s AS TIMESTAMP) AS ts", "v")
    val got = TimeSeries.trendDaily(e, "u", "ts", "v")
      .select(col("u"), col("n"), col("slope"), col("intercept"))
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(got == Set((1L, 3L, 3.0, -59000.0)))
  }

  test("interpolate: gap days lerped between exact daily endpoints") {
    // u1: 10.0 on Jan 1, 16.0 on Jan 4 — Jan 2/3 lerp to 12/14; the
    // last active day emits itself uninterpolated. u2: singleton.
    val e = Seq(
      (1L, "2024-01-01 08:00:00", 4.0), (1L, "2024-01-01 09:00:00", 6.0),
      (1L, "2024-01-04 10:00:00", 16.0),
      (2L, "2024-02-01 12:00:00", 5.5)
    ).toDF("u", "ts_s", "v")
      .selectExpr("u", "CAST(ts_s AS TIMESTAMP) AS ts", "v")
    val got = TimeSeries.interpolateDaily(e, "u", "ts", "v")
      .select(col("u"), col("day").cast("string"), col("value"),
        col("interpolated"))
      .as[(Long, String, Double, Boolean)].collect().toSet
    assert(got == Set(
      (1L, "2024-01-01", 10.0, false),
      (1L, "2024-01-02", 12.0, true),
      (1L, "2024-01-03", 14.0, true),
      (1L, "2024-01-04", 16.0, false),
      (2L, "2024-02-01", 5.5, false)))
  }

  test("ewmaHalvingDaily: integer halving recurrence on exact cents") {
    // u1: days 250+150=400, 300 cents -> ewma 400, (400+300)>>1=350
    val got = TimeSeries.ewmaHalvingDaily(ev, "u", "ts", "v")
      .select("u", "day", "cents", "ewma")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, "2024-01-01", 400L, 400L),
      (1L, "2024-01-04", 300L, 350L),
      (2L, "2024-02-10", 725L, 725L),
      (3L, "2024-03-01", 100L, 100L),
      (3L, "2024-03-02", 200L, 150L)))
  }

  test("ewmaHalvingDaily truncates toward zero on negative odd sums") {
    // refund days drive the accumulator negative: cents -300, then 100
    // truncating: (-300 + 100) / 2 = -100 (floor shift would give -100
    // here too, so use an ODD negative: -301 + 100 = -201 ->
    // truncate -100, floor -101 — the DuckDB `//` oracle truncates)
    val neg = Seq(
      (7L, "2024-01-01 10:00:00", -3.01),
      (7L, "2024-01-02 10:00:00", 1.00)
    ).toDF("u", "ts_s", "v")
      .selectExpr("u", "CAST(ts_s AS TIMESTAMP) AS ts", "v")
    val got = TimeSeries.ewmaHalvingDaily(neg, "u", "ts", "v")
      .select("u", "day", "cents", "ewma")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got == Set(
      (7L, "2024-01-01", -301L, -301L),
      (7L, "2024-01-02", 100L, -100L)))
  }

  test("ewmaHalvingDaily is partitioning-independent (bit-exact)") {
    val a = TimeSeries.ewmaHalvingDaily(ev, "u", "ts", "v")
      .collect().toSet
    val b = TimeSeries.ewmaHalvingDaily(ev.repartition(7), "u", "ts", "v")
      .collect().toSet
    assert(a == b)
  }

  test("cusumDaily: zero-seeded clamped drift fold with truncating mean") {
    // one user, cents 100, 100, 700 over 3 days -> mu = 300
    // s: max(0,100-300)=0, max(0,0+100-300)=0, max(0,0+700-300)=400
    val ev3 = Seq(
      (9L, "2024-01-01 10:00:00", 1.0),
      (9L, "2024-01-02 10:00:00", 1.0),
      (9L, "2024-01-03 10:00:00", 7.0)
    ).toDF("u", "ts_s", "v")
      .selectExpr("u", "CAST(ts_s AS TIMESTAMP) AS ts", "v")
    val got = TimeSeries.cusumDaily(ev3, "u", "ts", "v")
      .select("day", "cents", "cusum", "alarm")
      .as[(String, Long, Long, Int)].collect().sortBy(_._1).toList
    assert(got == List(
      ("2024-01-01", 100L, 0L, 0),
      ("2024-01-02", 100L, 0L, 0),
      ("2024-01-03", 700L, 400L, 0)))
    // tighter alarm threshold fires on the drift day
    val tight = TimeSeries.cusumDaily(ev3, "u", "ts", "v", alarmMult = 1L)
      .filter(col("alarm") === 1).select("day").as[String].collect()
    assert(tight.toSeq == Seq("2024-01-03"))
  }

  test("holtHalvingDaily: level+trend recurrence truncates toward zero") {
    // cents 1000, 100, 100: a steep decline drives trend negative with
    // ODD intermediate sums — the floor-vs-truncate discriminator.
    //   d1: l=1000, b=0
    //   d2: l=(1000+0+100)/2=550, b=(0+(550-1000))/2=trunc(-225.0)=-225
    //   d3: l=(550-225+100)/2=trunc(212.5)=212,
    //       b=(-225+(212-550))/2=trunc(-281.5)=-281  (floor were -282)
    val e = Seq(
      (1L, "2024-01-01 10:00:00", 10.0),
      (1L, "2024-01-02 10:00:00", 1.0),
      (1L, "2024-01-03 10:00:00", 1.0)
    ).toDF("u", "ts_s", "v")
      .selectExpr("u", "CAST(ts_s AS TIMESTAMP) AS ts", "v")
    val got = TimeSeries.holtHalvingDaily(e, "u", "ts", "v")
      .select("day", "cents", "level", "trend")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toList
    assert(got == List(
      ("2024-01-01", 1000L, 1000L, 0L),
      ("2024-01-02", 100L, 550L, -225L),
      ("2024-01-03", 100L, 212L, -281L)))
  }

  test("holtHalvingDaily is partitioning-independent (bit-exact)") {
    val a = TimeSeries.holtHalvingDaily(ev, "u", "ts", "v")
      .collect().toSet
    val b = TimeSeries.holtHalvingDaily(ev.repartition(7), "u", "ts", "v")
      .collect().toSet
    assert(a == b)
  }
}
