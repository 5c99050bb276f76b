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

  test("single-event keys emit nothing") {
    val e = Seq((1L, 1L, "2024-01-01 10:00:00", "view"))
      .toDF("u", "eid", "ts_s", "et")
      .selectExpr("u", "eid", "CAST(ts_s AS TIMESTAMP) AS ts", "et")
    assert(Sequence.transitions(e, "u", "et", "ts", "eid").count() == 0)
  }
}
