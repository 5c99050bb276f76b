package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence mining over the per-key timeline — the first-order
  * (Markov) transition structure of user behavior, the summary every
  * product-analytics "path analysis" view is built from. The reference
  * replicates rows and leaves sequence analysis to ClickHouse query
  * functions (`sequenceMatch` et al.); SURVEY §2 maps no such
  * operator, so this is engine surface (Funnel covers the ORDERED
  * PATTERN match; this is the full transition matrix).
  *
  * Shape (the 100 TB argument): ONE key-partitioned sort window (the
  * data-sized exchange — same cost class as any per-key ordering),
  * then an aggregate whose domain is |event types|², not rows, and a
  * window over THAT tiny frame for the per-source normalization.
  * Nothing after the lag ever moves event-sized data again. */
object Sequence {

  /** Per-key consecutive-event transition counts and probabilities.
    * Ordering is the `(tsCol, tiebreakCol)` TOTAL order, so ties at
    * equal timestamps are deterministic. Each key's first event has
    * no predecessor and feeds no pair; keys never chain into each
    * other. `p` = n / Σ n over the same `prev` — one fixed double
    * division both engines evaluate identically. */
  def transitions(df: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, tiebreakCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tiebreakCol))
    val pairs = df
      .withColumn("prev_type", lag(col(typeCol), 1).over(w))
      .where(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
    val byPrev = Window.partitionBy(col("prev_type"))
    pairs.withColumn("p",
      col("n").cast("double") / sum(col("n")).over(byPrev).cast("double"))
  }

  /** Linear multi-touch attribution: each conversion's credit is split
    * equally across ALL of the key's touch events (types in
    * `touchTypes`) that precede it and follow the previous conversion —
    * the standard "linear" model, reported as the exact distribution
    * histogram rather than a float total.
    *
    * Journey assignment avoids as-of-join machinery entirely: an event
    * belongs to journey `j` = number of conversions at-or-after it in
    * the key's timeline, computed as a RUNNING sum over the REVERSED
    * sort order (Spark evaluates `UNBOUNDED PRECEDING` frames
    * incrementally; the equivalent `CURRENT ROW .. UNBOUNDED FOLLOWING`
    * frame over the forward order re-aggregates per row — O(n²) per
    * key). Events after the key's last conversion get j = 0 and are
    * unattributed.
    *
    * Output groups journeys by (touch type, journey size n, type count
    * c): `journeys` is the exact count of such journeys and `credit` =
    * (journeys·c)/n — exact integers through one double division, the
    * fixed tree both engines evaluate bit-identically. Summing credits
    * across rows is deliberately left to the reader: a distributed
    * float sum is order-dependent and could not be oracle-gated.
    *
    * Shape: the same single data-sized exchange as [[transitions]]
    * (one key-partitioned sort window), then aggregates over journey-
    * and histogram-sized frames only. */
  def linearCredit(df: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, tiebreakCol: String, touchTypes: Seq[String],
      conversionType: String): DataFrame = {
    val rev = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(tiebreakCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perJourney = df
      .withColumn("journey",
        sum(when(col(typeCol) === conversionType, 1L).otherwise(0L))
          .over(rev))
      .where(col("journey") > 0 && col(typeCol).isInCollection(touchTypes))
      .groupBy(col(keyCol), col("journey"), col(typeCol).as("touch_type"))
      .agg(count(lit(1)).as("c_type"))
    val journeySize = Window.partitionBy(col(keyCol), col("journey"))
    perJourney
      .withColumn("n_touches", sum(col("c_type")).over(journeySize))
      .groupBy(col("touch_type"), col("n_touches"), col("c_type"))
      .agg(count(lit(1)).as("journeys"))
      .withColumn("credit",
        (col("journeys") * col("c_type")).cast("double") /
          col("n_touches").cast("double"))
  }

  /** Top user paths: the first `k` event types of each key's timeline
    * joined with `>` into a path string, counted across keys — the
    * "what do users do first" view. One key-partitioned sort window
    * (row_number caps state at `k` rows per key before the collect),
    * then a groupBy over path strings whose cardinality is bounded by
    * |types|^k, never by keys. */
  def topPaths(df: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, tiebreakCol: String, k: Int): DataFrame = {
    require(k > 0, "topPaths: k must be positive")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tiebreakCol))
    df.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .groupBy(col(keyCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("rn"), col(typeCol).as("t")))),
          e => e.getField("t")),
        ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_keys"))
  }

  /** ClickHouse `sequenceMatch`/`sequenceCount` with per-step time
    * bounds — the pattern `(?1)(?t<=g1)(?2)(?t<=g2)(?3)…`: over the
    * subsequence of a key's events whose type is one of `steps` (the
    * condition-filtered timeline), an anchor matches iff the next k−1
    * subsequence events carry the step types IN ORDER and each
    * adjacent gap is within its bound. This is a STRICT-ADJACENCY
    * variant over that filtered subsequence — ClickHouse's matcher
    * additionally allows intervening on-pattern events between matched
    * steps (a second 'view' between a view and its click would not
    * break the engine's match but does break this one), so counts here
    * are a lower bound on the engine's, not an equivalence —
    * [[seqMatchSkip]] is the engine-equivalent matcher. Counts are per-ANCHOR (overlapping), which — unlike the
    * engine's greedy non-overlap `sequenceCount` — is insertion-order
    * independent and therefore oracle-gateable; `sequenceMatch` (the
    * boolean) is identical under both conventions.
    *
    * Returns the bounded histogram `(n_matches, n_keys)` over keys
    * with ≥1 match: output is |distinct match counts|-sized, never
    * key- or event-sized.
    *
    * Shape: filter to on-pattern types FIRST (the scan drops every
    * other row before any exchange), then ONE key-partitioned sort
    * window evaluates all k−1 `lead`s together — a single data-sized
    * shuffle + sort, no self-join, no per-key array materialization.
    * Ordering is the `(tsCol, tiebreakCol)` total order, so ties are
    * deterministic. */
  def seqMatch(df: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, tiebreakCol: String, steps: Seq[String],
      maxGaps: Seq[Column]): DataFrame = {
    require(steps.size >= 2, "seqMatch: need at least two steps")
    require(maxGaps.size == steps.size - 1,
      "seqMatch: need one gap bound per adjacent step pair")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tiebreakCol))
    val filtered = df
      .filter(col(typeCol).isInCollection(steps.distinct))
      .select(col(keyCol), col(typeCol), col(tsCol), col(tiebreakCol))
    val withLeads = (1 until steps.size).foldLeft(filtered) { (acc, j) =>
      acc.withColumn(s"_ty$j", lead(col(typeCol), j).over(w))
        .withColumn(s"_ts$j", lead(col(tsCol), j).over(w))
    }
    val matched = (1 until steps.size).map { j =>
      val prevTs = if (j == 1) col(tsCol) else col(s"_ts${j - 1}")
      col(s"_ty$j") === steps(j) && col(s"_ts$j") <= prevTs + maxGaps(j - 1)
    }.reduce(_ && _) && col(typeCol) === steps.head
    withLeads.filter(matched)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_matches"))
      .groupBy(col("n_matches"))
      .agg(count(lit(1)).as("n_keys"))
  }

  /** [[seqMatch]]'s skip-allowed sibling — FULL ClickHouse
    * `sequenceMatch('(?1)(?t<=g1)(?2)…')` fidelity: between matched
    * steps any number of intervening events (on-pattern or not) may
    * occur; an anchor matches iff SOME chain
    * `e₁ = anchor < e₂ < … < e_k` (strictly later in the
    * `(tsCol, tiebreakCol)` total order) carries the step types in
    * order with each adjacent MATCHED-pair gap within its bound.
    * Counts are per-anchor (overlapping), the oracle-gateable
    * convention shared with [[seqMatch]].
    *
    * Algorithm — backward feasibility DP, no self-joins and no
    * per-key arrays: feasibility of step s at event e needs only the
    * MINIMUM timestamp among already-feasible step-(s+1) events
    * strictly after e (if the earliest one misses the gap bound,
    * every later one does too; its own feasibility is
    * position-independent). That minimum is a running `min` over a
    * DESC-ordered window, so the whole match is k−1 window passes
    * over ONE key-partitioned sort — a single data-sized exchange,
    * same cost class as [[seqMatch]]'s lead formulation.
    *
    * Returns the `(n_matches, n_keys)` histogram over keys with ≥1
    * feasible anchor. */
  def seqMatchSkip(df: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, tiebreakCol: String, steps: Seq[String],
      maxGaps: Seq[Column]): DataFrame = {
    require(steps.size >= 2, "seqMatchSkip: need at least two steps")
    require(maxGaps.size == steps.size - 1,
      "seqMatchSkip: need one gap bound per adjacent step pair")
    val k = steps.size
    val wDesc = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(tiebreakCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val filtered = df
      .filter(col(typeCol).isInCollection(steps.distinct))
      .select(col(keyCol), col(typeCol), col(tsCol), col(tiebreakCol))
      .withColumn(s"_f$k", col(typeCol) === steps(k - 1))
    val solved = (k - 1 to 1 by -1).foldLeft(filtered) { (acc, s) =>
      // earliest already-feasible step-(s+1) event strictly after this
      // row in the total order (DESC window, current row excluded)
      val nextF = min(when(col(s"_f${s + 1}"), col(tsCol))).over(wDesc)
      acc.withColumn(s"_f$s", col(typeCol) === steps(s - 1) &&
        nextF <= col(tsCol) + maxGaps(s - 1))
    }
    solved.filter(col("_f1"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_matches"))
      .groupBy(col("n_matches"))
      .agg(count(lit(1)).as("n_keys"))
  }

  /** ClickHouse `sequenceNextNode` (head/first_match): for each key,
    * find the FIRST run of events matching `steps` CONSECUTIVELY in
    * the full per-key timeline (no gaps allowed — unlike [[seqMatch]]
    * this is raw-stream adjacency, the engine's contract) and report
    * the type of the event immediately after it. Keys whose first
    * matching run is their timeline's tail (no next event) are
    * dropped. Output is the `(next_type, n_keys)` histogram — bounded
    * by |event types|, never key-sized.
    *
    * Shape: ONE key-partitioned sort window carries all k leads; the
    * first-run pick is a min_by over anchors under the (ts, tiebreak)
    * total order, so the result is insertion-order independent. */
  def nextNode(df: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, tiebreakCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "nextNode: need at least one step")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tiebreakCol))
    val k = steps.size
    val base = df.select(col(keyCol), col(typeCol), col(tsCol),
      col(tiebreakCol))
    val withLeads = (1 to k).foldLeft(base) { (acc, j) =>
      acc.withColumn(s"_ty$j", lead(col(typeCol), j).over(w))
    }
    val isMatch = steps.zipWithIndex.map { case (st, i) =>
      (if (i == 0) col(typeCol) else col(s"_ty$i")) === st
    }.reduce(_ && _)
    withLeads.filter(isMatch && col(s"_ty$k").isNotNull)
      .groupBy(col(keyCol))
      .agg(min_by(col(s"_ty$k"),
        struct(col(tsCol), col(tiebreakCol))).as("next_type"))
      .groupBy(col("next_type"))
      .agg(count(lit(1)).as("n_keys"))
  }

  /** Last-touch attribution: every `conversionType` event joined to
    * the MOST RECENT preceding `touchType` event of the same key (or
    * null if the key never touched before converting).
    *
    * Shape: this is an as-of self-join, but expressed as a running
    * `last(…, ignoreNulls)` over the one key-partitioned sort window
    * — an UNBOUNDED PRECEDING running frame, which Spark evaluates
    * incrementally (state = one row), never re-scanning the frame per
    * row. Same single data-sized exchange as [[transitions]]; the
    * filter to conversions happens after, so output is conversion-
    * sized. A join formulation would shuffle the table twice. */
  def lastTouch(df: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, tiebreakCol: String, touchType: String,
      conversionType: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tiebreakCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("touch",
        last(when(col(typeCol) === touchType,
          struct(col(tsCol).as("touch_ts"),
            col(tiebreakCol).as("touch_id"))), ignoreNulls = true)
          .over(w))
      .where(col(typeCol) === conversionType)
      .select(col(keyCol), col(tiebreakCol).as("conversion_id"),
        col(tsCol).as("conversion_ts"),
        col("touch.touch_id").as("touch_id"),
        col("touch.touch_ts").as("touch_ts"))
  }
}
