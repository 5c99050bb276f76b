package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class CohortSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  // u1, u2 join day 1 (u1 returns day 2 and 3, u2 never);
  // u3 joins day 2 and returns day 3. Repeat visits same day must
  // not double-count.
  private lazy val ev = Seq(
    (1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 11:00:00"),
    (1L, "2024-01-02 09:00:00"), (1L, "2024-01-03 09:00:00"),
    (2L, "2024-01-01 12:00:00"),
    (3L, "2024-01-02 08:00:00"), (3L, "2024-01-03 08:00:00")
  ).toDF("u", "ts_s").selectExpr("u", "CAST(ts_s AS TIMESTAMP) AS ts")

  test("retention cells are exact distinct-active counts") {
    val got = Cohort.retention(ev, "u", "ts")
      .as[(String, Int, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got == Map(
      ("2024-01-01", 0) -> ((2L, 2L)), // both day-1 users active day 1
      ("2024-01-01", 1) -> ((1L, 2L)), // only u1 returns
      ("2024-01-01", 2) -> ((1L, 2L)),
      ("2024-01-02", 0) -> ((1L, 1L)),
      ("2024-01-02", 1) -> ((1L, 1L))))
  }

  test("offset 0 count equals cohort size (everyone active on join day)") {
    val rows = Cohort.retention(ev, "u", "ts")
      .as[(String, Int, Long, Long)].collect()
    rows.filter(_._2 == 0).foreach { r => assert(r._3 == r._4, r) }
    // and every later-day count is bounded by the cohort size
    rows.foreach { r => assert(r._3 <= r._4, r) }
  }
}
