package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class SequenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  test("transitions: per-key bigrams, tiebreak order, no cross-key chain") {
    // u1: view→cart→buy plus a SAME-TIMESTAMP pair where event_id
    // decides (id 2 before id 3 ⇒ cart→buy, not buy→cart);
    // u2: view→view — u1's last event must NOT chain into u2's first.
    val e = Seq(
      (1L, 1L, "2024-01-01 10:00:00", "view"),
      (1L, 2L, "2024-01-01 11:00:00", "cart"),
      (1L, 3L, "2024-01-01 11:00:00", "buy"),
      (2L, 4L, "2024-01-01 09:00:00", "view"),
      (2L, 5L, "2024-01-01 10:00:00", "view")
    ).toDF("u", "eid", "ts_s", "et")
      .selectExpr("u", "eid", "CAST(ts_s AS TIMESTAMP) AS ts", "et")
    val got = Sequence.transitions(e, "u", "et", "ts", "eid")
      .select(col("prev_type"), col("next_type"), col("n"), col("p"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(got == Set(
      ("view", "cart", 1L, 0.5), // view also goes view→view once
      ("view", "view", 1L, 0.5),
      ("cart", "buy", 1L, 1.0)))
  }

  test("lastTouch: nearest preceding touch, same-ts order, null when none") {
    // u1: click(1) → view(2) → purchase(3) attributes to click 1,
    // skipping the intervening non-touch view; a later click(4) then
    // purchase(5) re-attributes to 4 (most recent, not first).
    // u2: purchase with no prior click → null touch.
    // u3: click(7) and purchase(8) at the SAME timestamp — (ts, id)
    // order puts the click before, so it still counts.
    val e = Seq(
      (1L, 1L, "2024-01-01 10:00:00", "click"),
      (1L, 2L, "2024-01-01 10:30:00", "view"),
      (1L, 3L, "2024-01-01 11:00:00", "purchase"),
      (1L, 4L, "2024-01-01 12:00:00", "click"),
      (1L, 5L, "2024-01-01 13:00:00", "purchase"),
      (2L, 6L, "2024-01-01 09:00:00", "purchase"),
      (3L, 7L, "2024-01-01 12:00:00", "click"),
      (3L, 8L, "2024-01-01 12:00:00", "purchase")
    ).toDF("u", "eid", "ts_s", "et")
      .selectExpr("u", "eid", "CAST(ts_s AS TIMESTAMP) AS ts", "et")
    val got = Sequence.lastTouch(e, "u", "et", "ts", "eid",
      "click", "purchase")
      .select(col("u"), col("conversion_id"),
        col("touch_id").cast("string"))
      .as[(Long, Long, Option[String])].collect().toSet
    assert(got == Set(
      (1L, 3L, Some("1")),
      (1L, 5L, Some("4")),
      (2L, 6L, None),
      (3L, 8L, Some("7"))))
  }

  test("single-event keys emit nothing") {
    val e = Seq((1L, 1L, "2024-01-01 10:00:00", "view"))
      .toDF("u", "eid", "ts_s", "et")
      .selectExpr("u", "eid", "CAST(ts_s AS TIMESTAMP) AS ts", "et")
    assert(Sequence.transitions(e, "u", "et", "ts", "eid").count() == 0)
  }
}
