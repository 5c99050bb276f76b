package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key time-series regularization: aggregate an event stream to a
  * fixed grain and FILL THE GAPS, so every key carries one row per
  * period between its first and last activity — the shape every
  * downstream rate/trend/anomaly computation assumes (a missing day
  * must read as an explicit zero, not an absent row).
  *
  * The reference ships raw change rows into ClickHouse and leaves
  * densification to `WITH FILL` at query time (ABSENT in the syncer
  * itself — SURVEY §2 maps no such operator), so this is engine
  * surface: the batch-side materialization of that query-time fill.
  *
  * Shape (the 100 TB argument): ONE data-sized shuffle — the
  * `(key, period)` aggregate — then a key-partitioned `lead` window
  * over the ALREADY-AGGREGATED frame (rows = active key-periods, not
  * events) and a scan-local `sequence` explode that manufactures each
  * gap's zero rows between consecutive active periods. No
  * spine-generation join, no per-key driver loop; output volume is
  * Σ per-key span lengths, and the explode is bounded per row by the
  * longest single gap, never by the corpus. A calendar-spine
  * `crossJoin` (keys × all days) would pay keys·days rows whether or
  * not a key was alive — this pays only each key's own span. */
object TimeSeries {

  /** OHLC downsampling: per (key, day), the first/last/min/max of
    * `valueCol` with first/last resolved by `(ts, tiebreak)` — the
    * ClickHouse `argMin/argMax` materialized-rollup every metrics
    * pipeline builds over the synced table. ONE aggregate shuffle on
    * (key, day); open/close ride as `max_by`/`min_by` over a
    * `(ts, tiebreak)` struct so the result is total-ordered and
    * deterministic even when two events share a timestamp. Sums are
    * exact decimal (order-independent), emitted as double. */
  def ohlcDaily(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tiebreakCol: String): DataFrame = {
    val ord = struct(col(tsCol), col(tiebreakCol))
    df.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(
        min_by(col(valueCol), ord).as("open"),
        max_by(col(valueCol), ord).as("close"),
        min(col(valueCol)).as("low"),
        max(col(valueCol)).as("high"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double")
          .as("sum_value"))
  }

  /** Trailing `windowDays`-day rolling sums per key over the daily
    * grain — the moving-average/rate frame on top of the rollup.
    *
    * Plan: the (key, day) aggregate pays the one data-sized shuffle;
    * the window then re-exchanges only the ALREADY-AGGREGATED daily
    * frame on `key` (rows = active key-days, a tiny fraction of the
    * input) and sorts within partitions. The frame is a RANGE frame
    * over the epoch-day number, so calendar gaps shorten the window
    * arithmetically — no gap-fill rows are manufactured just to make
    * a ROWS frame honest. Sums are exact decimal inside the frame
    * (order-independent), emitted as double. */
  def rollingDaily(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, windowDays: Int): DataFrame = {
    val daily = df
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("sv"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("epoch_day"))
      .rangeBetween(-(windowDays - 1L), 0L)
    daily
      .withColumn("epoch_day",
        datediff(col("day"), lit("1970-01-01")).cast("long"))
      .select(col(keyCol), col("day"),
        sum(col("sv")).over(w).cast("double").as("roll_sum"),
        sum(col("n")).over(w).as("roll_events"))
  }

  /** Trailing-baseline anomaly detection on the daily grain: a day is
    * anomalous when its total deviates from the PRECEDING
    * `baselineDays`-day window by more than `tau` sample standard
    * deviations (the day itself is excluded from its own baseline, so
    * a spike cannot vouch for itself). Emits only flagged rows.
    *
    * Determinism across engines (the oracle twin replays this in
    * DuckDB): the window carries only EXACT decimal moment sums
    * (n, Σx, Σx²) — order-independent — and mean/variance are derived
    * from them in one fixed double expression, so both engines
    * evaluate the identical IEEE tree. A windowed `stddev` would hang
    * the gate on two engines' accumulation orders.
    *
    * Plan: same two exchanges as [[rollingDaily]] — the data-sized
    * (key, day) aggregate, then a key-partitioned RANGE window over
    * active key-days only. Variance ≥ 0 is clamped (FP cancellation
    * near-constant baselines). */
  def anomalies(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, baselineDays: Int, tau: Double,
      minBaseline: Int): DataFrame = {
    val daily = df
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(sum(col(valueCol).cast("decimal(18,2)")).as("x"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("epoch_day"))
      .rangeBetween(-baselineDays.toLong, -1L)
    daily
      .withColumn("epoch_day",
        datediff(col("day"), lit("1970-01-01")).cast("long"))
      .withColumn("n_base", count(col("x")).over(w))
      .withColumn("sx", sum(col("x")).over(w).cast("double"))
      .withColumn("sx2",
        sum((col("x") * col("x")).cast("decimal(38,4)")).over(w)
          .cast("double"))
      .where(col("n_base") >= minBaseline)
      .withColumn("mu", col("sx") / col("n_base"))
      .withColumn("sigma", sqrt(greatest(lit(0.0),
        (col("sx2") - col("sx") * col("sx") / col("n_base")) /
          (col("n_base") - 1))))
      .where(abs(col("x").cast("double") - col("mu")) >
        lit(tau) * col("sigma"))
      .select(col(keyCol), col("day"), col("x").cast("double").as("value"),
        col("mu"), col("sigma"), col("n_base"))
  }

  /** Per-key linear trend (least-squares slope/intercept) of the
    * daily total against the epoch day — "is this key growing?",
    * computed for every key at once.
    *
    * Determinism across engines: the per-key reduction carries only
    * EXACT decimal moments (n, Σx, Σy, Σxy, Σx²; x = epoch day, an
    * integer, y = the exact decimal daily sum) — all
    * order-independent — and slope/intercept derive from them in one
    * fixed IEEE double tree the oracle replays verbatim. A built-in
    * `regr_slope` would hang the gate on engine-internal accumulation
    * order. Keys need ≥ 2 distinct active days (the denominator is 0
    * otherwise — no line through one point).
    *
    * Plan: the (key, day) aggregate is the one data-sized shuffle;
    * the moment reduction then aggregates the daily frame per key —
    * strictly smaller — and the closed form is scan-local. */
  def trendDaily(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val daily = df
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(sum(col(valueCol).cast("decimal(18,2)")).as("y"))
      .withColumn("x",
        datediff(col("day"), lit("1970-01-01")).cast("decimal(18,0)"))
    val m = daily.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n"),
      sum(col("x")).cast("double").as("sx"),
      sum(col("y")).cast("double").as("sy"),
      sum((col("x") * col("y")).cast("decimal(38,4)")).cast("double")
        .as("sxy"),
      sum((col("x") * col("x")).cast("decimal(38,0)")).cast("double")
        .as("sxx"))
    m.where(col("n") >= 2)
      .withColumn("slope",
        (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")))
      .withColumn("intercept",
        (col("sy") - col("slope") * col("sx")) / col("n"))
      .select(col(keyCol), col("n"), col("slope"), col("intercept"))
  }

  /** Linear interpolation across inactive days — the gap-fill twin
    * for continuous metrics, where a missing day means "unobserved",
    * not zero. Each gap day gets the value lerped between the
    * surrounding active days' daily sums; active days keep their own.
    *
    * Plan: identical to [[gapFillDaily]] — ONE data-sized aggregate,
    * a lead window over active key-days, a bounded scan-local
    * `sequence` explode per gap. The lerp is a fixed double
    * expression of exact decimal endpoints, so the oracle twin
    * reproduces it bit-for-bit. */
  def interpolateDaily(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val daily = df
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(sum(col(valueCol).cast("decimal(18,2)")).as("v"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day"))
    daily
      .withColumn("next_day", lead(col("day"), 1).over(w))
      .withColumn("next_v", lead(col("v"), 1).over(w))
      .select(col(keyCol), col("day"), col("v"), col("next_day"),
        col("next_v"),
        explode(sequence(col("day"),
          coalesce(date_sub(col("next_day"), 1), col("day")),
          expr("interval 1 day"))).as("fill_day"))
      .select(col(keyCol), col("fill_day").as("day"),
        when(col("fill_day") === col("day"), col("v").cast("double"))
          .otherwise(
            // frac ∈ (0,1): position of the gap day inside [day, next)
            col("v").cast("double") +
              (col("next_v").cast("double") - col("v").cast("double")) *
                (datediff(col("fill_day"), col("day")).cast("double") /
                  datediff(col("next_day"), col("day")).cast("double")))
          .as("value"),
        (col("fill_day") =!= col("day")).as("interpolated"))
  }

  /** Daily resample of `df` per `keyCol`: one row per (key, day) from
    * the key's first active day through its last, `n_events` = rows
    * that day, `sum_value` = exact decimal sum of `valueCol` (0, not
    * null, on gap days). */
  /** Integer-exact exponential smoothing (α = ½) over each key's
    * daily totals: `e₁ = c₁`, `eᵢ = ⌊(eᵢ₋₁ + cᵢ) / 2⌋` on exact cents,
    * the division TRUNCATING TOWARD ZERO (same tdiv2 as
    * [[holtHalvingDaily]] — a floor shift would disagree with the
    * oracle's `//` on negative odd accumulators, e.g. refund days).
    * The halving fold makes EWMA — normally hopeless to replay across
    * engines because FP accumulation order differs — a pure integer
    * recurrence: any engine that folds the same sorted list gets the
    * same bits (the DuckDB oracle replays prefixes with list_reduce).
    *
    * Shape: one aggregate to (key, day) grain, then one shuffle to key
    * grain where the fold runs inside a single array expression —
    * per-key state is its active-day count (≤ series span), the
    * documented bound for array-fold operators here (cf. Scd.scala's
    * history arrays). Output one row per active (key, day):
    * `(key, day, cents, ewma)`. */
  def ewmaHalvingDaily(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    def tdiv2(c: Column): Column =
      when(c >= 0, shiftright(c, 1)).otherwise(-shiftright(-c, 1))
    val daily = df.groupBy(col(keyCol),
        col(tsCol).cast("date").cast("string").as("day"))
      .agg(sum(round(col(valueCol) * 100).cast("long")).as("cents"))
    val accType =
      "array<struct<day:string,cents:bigint,ewma:bigint>>"
    val folded = daily
      .groupBy(col(keyCol))
      .agg(array_sort(collect_list(struct(col("day"), col("cents"))))
        .as("arr"))
      .withColumn("f", aggregate(
        col("arr"),
        expr(s"CAST(array() AS $accType)"),
        (acc, x) => concat(acc, array(struct(
          x.getField("day").as("day"),
          x.getField("cents").as("cents"),
          when(size(acc) === 0, x.getField("cents"))
            .otherwise(tdiv2(
              element_at(acc, -1).getField("ewma") +
                x.getField("cents"))).as("ewma"))))))
    folded.select(col(keyCol), explode(col("f")).as("e"))
      .select(col(keyCol), col("e.day").as("day"),
        col("e.cents").as("cents"), col("e.ewma").as("ewma"))
  }

  /** Integer CUSUM drift detector per key:
    * `s_i = max(0, s_{i-1} + cᵢ − μ)` over exact daily cents with μ
    * the key's truncating mean; `alarm` fires when s exceeds
    * `alarmMult·μ`. Zero-seeded fold (both engines agree from the
    * first element), same one-aggregate-one-fold shape and per-key
    * state bound as [[ewmaHalvingDaily]].
    * @return (key, day, cents, cusum, alarm) */
  def cusumDaily(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, alarmMult: Long = 3L): DataFrame = {
    val daily = df.groupBy(col(keyCol),
        col(tsCol).cast("date").cast("string").as("day"))
      .agg(sum(round(col(valueCol) * 100).cast("long")).as("cents"))
    val accType = "array<struct<day:string,cents:bigint,s:bigint>>"
    daily.groupBy(col(keyCol))
      .agg(array_sort(collect_list(struct(col("day"), col("cents"))))
          .as("arr"),
        expr("sum(cents) div count(1)").as("mu"))
      .withColumn("f", aggregate(
        col("arr"),
        expr(s"CAST(array() AS $accType)"),
        (acc, x) => concat(acc, array(struct(
          x.getField("day").as("day"),
          x.getField("cents").as("cents"),
          greatest(
            when(size(acc) === 0, lit(0L))
              .otherwise(element_at(acc, -1).getField("s")) +
              x.getField("cents") - col("mu"), lit(0L)).as("s"))))))
      .select(col(keyCol), col("mu"), explode(col("f")).as("e"))
      .select(col(keyCol), col("e.day").as("day"),
        col("e.cents").as("cents"), col("e.s").as("cusum"),
        (col("e.s") > lit(alarmMult) * col("mu")).cast("int")
          .as("alarm"))
  }

  /** Integer-exact Holt (double-exponential) smoothing per key with
    * α = β = ½ over exact daily cents:
    * `level_i = ⌊(level_{i−1} + trend_{i−1} + c_i) / 2⌋`,
    * `trend_i = ⌊(trend_{i−1} + (level_i − level_{i−1})) / 2⌋`
    * seeded `(c_0, 0)` — level tracks the trend-adjusted forecast
    * blended with the observation, trend tracks the level delta. All
    * divisions TRUNCATE TOWARD ZERO (trend goes negative on declines;
    * a floor shift would disagree with the oracle's `//` on negative
    * odd values), so the whole chain is bit-replayable. Same
    * one-aggregate-one-fold shape and per-key state bound as
    * [[ewmaHalvingDaily]].
    * @return (key, day, cents, level, trend) */
  def holtHalvingDaily(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    def tdiv2(c: Column): Column =
      when(c >= 0, shiftright(c, 1)).otherwise(-shiftright(-c, 1))
    val daily = df.groupBy(col(keyCol),
        col(tsCol).cast("date").cast("string").as("day"))
      .agg(sum(round(col(valueCol) * 100).cast("long")).as("cents"))
    val accType =
      "array<struct<day:string,cents:bigint,level:bigint,trend:bigint>>"
    daily.groupBy(col(keyCol))
      .agg(array_sort(collect_list(struct(col("day"), col("cents"))))
        .as("arr"))
      .withColumn("f", aggregate(
        col("arr"),
        expr(s"CAST(array() AS $accType)"),
        (acc, x) => {
          val prevL = element_at(acc, -1).getField("level")
          val prevB = element_at(acc, -1).getField("trend")
          val lvl = when(size(acc) === 0, x.getField("cents"))
            .otherwise(tdiv2(prevL + prevB + x.getField("cents")))
          val trd = when(size(acc) === 0, lit(0L))
            .otherwise(tdiv2(prevB + (lvl - prevL)))
          concat(acc, array(struct(
            x.getField("day").as("day"),
            x.getField("cents").as("cents"),
            lvl.as("level"), trd.as("trend"))))
        }))
      .select(col(keyCol), explode(col("f")).as("e"))
      .select(col(keyCol), col("e.day").as("day"),
        col("e.cents").as("cents"), col("e.level").as("level"),
        col("e.trend").as("trend"))
  }

  def gapFillDaily(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val daily = df
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,2)")).as("sum_dec"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day"))
    daily
      .withColumn("next_day", lead(col("day"), 1).over(w))
      // [day, next_day) densified; the key's last active day emits
      // itself alone (no trailing fill past the final observation)
      .select(col(keyCol), col("n_events"), col("sum_dec"), col("day"),
        explode(sequence(col("day"),
          coalesce(date_sub(col("next_day"), 1), col("day")),
          expr("interval 1 day"))).as("fill_day"))
      .select(col(keyCol), col("fill_day").as("day"),
        when(col("fill_day") === col("day"), col("n_events"))
          .otherwise(lit(0L)).as("n_events"),
        when(col("fill_day") === col("day"), col("sum_dec"))
          .otherwise(lit(0).cast("decimal(18,2)"))
          .cast("double").as("sum_value"))
  }
}
