package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention — the "do users come back" table behind every
  * growth dashboard: users grouped by their FIRST-activity day, then
  * for each (cohort, day-offset) cell the number of distinct cohort
  * members active that day, alongside the cohort size the consumer
  * divides by.
  *
  * Shape: one user-keyed aggregate for the cohort assignment, one
  * distinct over (user, day) — both map-side combined — and one join
  * of the two user-keyed frames (they share the exchange layout), then
  * a (cohort, offset)-keyed aggregate whose key space is bounded by
  * days², not rows. Counts are exact integers; days are calendar
  * arithmetic — identical in any engine, so the oracle replays
  * cell-for-cell. */
object Cohort {

  /** `(cohort_day, day_offset, n_active, cohort_size)` — cohort_day
    * rendered as a date string so the frame is engine-portable.
    * Cohort sizes come from the offset-0 cells (every user is active
    * on their own first day by definition), so the event table is
    * scanned exactly twice (cohort assignment + distinct activity) —
    * a separate sizes aggregate re-ran the whole first-day chain
    * (plan-audited 3 scans → 2). The days²-bounded cell frame is
    * persisted while both branches read it. */
  def retention(events: DataFrame, groupCol: String,
      tsCol: String): DataFrame = {
    val firstDay = events.groupBy(col(groupCol))
      .agg(min(to_date(col(tsCol))).as("_cohort"))
    val active = events
      .select(col(groupCol), to_date(col(tsCol)).as("_day")).distinct()
    val cells = active.join(firstDay, groupCol)
      .select(col("_cohort"),
        datediff(col("_day"), col("_cohort")).as("day_offset"))
      .groupBy("_cohort", "day_offset")
      .agg(count(lit(1)).as("n_active"))
      .persist()
    try {
      val sizes = cells.filter(col("day_offset") === 0)
        .select(col("_cohort"), col("n_active").as("cohort_size"))
      cells.join(broadcast(sizes), "_cohort")
        .select(col("_cohort").cast("string").as("cohort_day"),
          col("day_offset"), col("n_active"), col("cohort_size"))
        .localCheckpoint()
    } finally cells.unpersist(false)
  }
}
