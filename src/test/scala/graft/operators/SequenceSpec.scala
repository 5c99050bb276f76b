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

  test("linearCredit: journeys split at conversions, exact histogram") {
    // u1 journey A: view,view,click → purchase(4); journey B: click →
    // purchase(6). Trailing view(7) after the last purchase is
    // unattributed. u2: touches but NO conversion → contributes nothing.
    val e = Seq(
      (1L, 1L, "2024-01-01 10:00:00", "view"),
      (1L, 2L, "2024-01-01 10:10:00", "view"),
      (1L, 3L, "2024-01-01 10:20:00", "click"),
      (1L, 4L, "2024-01-01 11:00:00", "purchase"),
      (1L, 5L, "2024-01-01 12:00:00", "click"),
      (1L, 6L, "2024-01-01 13:00:00", "purchase"),
      (1L, 7L, "2024-01-01 14:00:00", "view"),
      (2L, 8L, "2024-01-01 09:00:00", "click")
    ).toDF("u", "eid", "ts_s", "et")
      .selectExpr("u", "eid", "CAST(ts_s AS TIMESTAMP) AS ts", "et")
    val got = Sequence.linearCredit(e, "u", "et", "ts", "eid",
      Seq("view", "click"), "purchase")
      .select(col("touch_type"), col("n_touches"), col("c_type"),
        col("journeys"), col("credit"))
      .as[(String, Long, Long, Long, Double)].collect().toSet
    // journey A (n=3): view c=2 credit 2/3, click c=1 credit 1/3;
    // journey B (n=1): click c=1 credit 1.
    assert(got == Set(
      ("view", 3L, 2L, 1L, 2.0 / 3.0),
      ("click", 3L, 1L, 1L, 1.0 / 3.0),
      ("click", 1L, 1L, 1L, 1.0)))
  }

  test("topPaths: first-k order, tiebreak, truncation") {
    // u1 has 4 events (two at the same ts where id orders them);
    // u2 matches u1's first-3 prefix exactly; k=3 groups them when
    // u1's 4th event is cut.
    val e = Seq(
      (1L, 1L, "2024-01-01 10:00:00", "view"),
      (1L, 2L, "2024-01-01 11:00:00", "click"),
      (1L, 3L, "2024-01-01 11:00:00", "cart"),
      (1L, 4L, "2024-01-01 12:00:00", "purchase"),
      (2L, 5L, "2024-01-01 09:00:00", "view"),
      (2L, 6L, "2024-01-01 09:30:00", "click"),
      (2L, 7L, "2024-01-01 09:45:00", "cart"),
      (3L, 8L, "2024-01-01 08:00:00", "error")
    ).toDF("u", "eid", "ts_s", "et")
      .selectExpr("u", "eid", "CAST(ts_s AS TIMESTAMP) AS ts", "et")
    val got = Sequence.topPaths(e, "u", "et", "ts", "eid", 3)
      .as[(String, Long)].collect().toSet
    assert(got == Set(("view>click>cart", 2L), ("error", 1L)))
  }

  test("single-event keys emit nothing") {
    val e = Seq((1L, 1L, "2024-01-01 10:00:00", "view"))
      .toDF("u", "eid", "ts_s", "et")
      .selectExpr("u", "eid", "CAST(ts_s AS TIMESTAMP) AS ts", "et")
    assert(Sequence.transitions(e, "u", "et", "ts", "eid").count() == 0)
  }

  private def sm(rows: Seq[(Long, Long, String, String)]) =
    Sequence.seqMatch(
      rows.toDF("u", "eid", "ts_s", "et")
        .selectExpr("u", "eid", "CAST(ts_s AS TIMESTAMP) AS ts", "et"),
      "u", "et", "ts", "eid", Seq("a", "b", "c"),
      Seq(expr("INTERVAL 10 MINUTES"), expr("INTERVAL 10 MINUTES")))
      .as[(Long, Long)].collect().toSet

  test("seqMatch: adjacency is over the on-pattern subsequence") {
    // u1: a → (off-pattern x ignored) → b → c, gaps within bounds — one
    // match; u2: a → b with an INTERVENING on-pattern a — the pattern
    // wants b directly after a in the subsequence, so u2 only matches
    // from its SECOND a (a,b,c adjacent there), also one match — but
    // u3's a,c,b order never matches.
    val got = sm(Seq(
      (1L, 1L, "2024-01-01 10:00:00", "a"),
      (1L, 2L, "2024-01-01 10:01:00", "x"),
      (1L, 3L, "2024-01-01 10:02:00", "b"),
      (1L, 4L, "2024-01-01 10:03:00", "c"),
      (2L, 5L, "2024-01-01 09:00:00", "a"),
      (2L, 6L, "2024-01-01 09:01:00", "a"),
      (2L, 7L, "2024-01-01 09:02:00", "b"),
      (2L, 8L, "2024-01-01 09:03:00", "c"),
      (3L, 9L, "2024-01-01 08:00:00", "a"),
      (3L, 10L, "2024-01-01 08:01:00", "c"),
      (3L, 11L, "2024-01-01 08:02:00", "b")))
    assert(got == Set((1L, 2L))) // n_matches=1 → two keys (u1, u2)
  }

  test("seqMatch: a step outside its gap bound kills the chain") {
    // a→b at 11 min > the 10-min bound; b→c fine — no match.
    val got = sm(Seq(
      (1L, 1L, "2024-01-01 10:00:00", "a"),
      (1L, 2L, "2024-01-01 10:11:00", "b"),
      (1L, 3L, "2024-01-01 10:12:00", "c")))
    assert(got.isEmpty)
    // boundary is inclusive: exactly 10 min matches
    val ok = sm(Seq(
      (1L, 1L, "2024-01-01 10:00:00", "a"),
      (1L, 2L, "2024-01-01 10:10:00", "b"),
      (1L, 3L, "2024-01-01 10:20:00", "c")))
    assert(ok == Set((1L, 1L)))
  }

  test("seqMatch: same-timestamp ties resolve by the tiebreak id") {
    // a and b share a timestamp; eid order (a before b) completes the
    // chain — reversed ids would put b first and break it.
    val ok = sm(Seq(
      (1L, 1L, "2024-01-01 10:00:00", "a"),
      (1L, 2L, "2024-01-01 10:00:00", "b"),
      (1L, 3L, "2024-01-01 10:05:00", "c")))
    assert(ok == Set((1L, 1L)))
    val broken = sm(Seq(
      (1L, 2L, "2024-01-01 10:00:00", "a"),
      (1L, 1L, "2024-01-01 10:00:00", "b"),
      (1L, 3L, "2024-01-01 10:05:00", "c")))
    assert(broken.isEmpty)
  }

  test("nextNode: first consecutive run wins, tail-run keys drop") {
    // u1: a,b,x,… — first run a→b is followed by x; a LATER a→b→y run
    // must not override (first_match). u2's only a→b run ends the
    // timeline — no next node, key dropped. u3: a,x,b is NOT
    // consecutive — no run at all.
    val e = Seq(
      (1L, 1L, "2024-01-01 10:00:00", "a"),
      (1L, 2L, "2024-01-01 10:01:00", "b"),
      (1L, 3L, "2024-01-01 10:02:00", "x"),
      (1L, 4L, "2024-01-01 10:03:00", "a"),
      (1L, 5L, "2024-01-01 10:04:00", "b"),
      (1L, 6L, "2024-01-01 10:05:00", "y"),
      (2L, 7L, "2024-01-01 09:00:00", "a"),
      (2L, 8L, "2024-01-01 09:01:00", "b"),
      (3L, 9L, "2024-01-01 08:00:00", "a"),
      (3L, 10L, "2024-01-01 08:01:00", "x"),
      (3L, 11L, "2024-01-01 08:02:00", "b"))
      .toDF("u", "eid", "ts_s", "et")
      .selectExpr("u", "eid", "CAST(ts_s AS TIMESTAMP) AS ts", "et")
    val got = Sequence.nextNode(e, "u", "et", "ts", "eid", Seq("a", "b"))
      .as[(String, Long)].collect().toSet
    assert(got == Set(("x", 1L)))
  }

  test("seqMatch: overlapping anchors each count; one exchange") {
    // a,a,b,c: anchor 1 sees subsequence-next a (no match), anchor 2
    // matches — per-anchor counting, no double-count of the tail.
    val df = Seq(
      (1L, 1L, "2024-01-01 10:00:00", "a"),
      (1L, 2L, "2024-01-01 10:01:00", "a"),
      (1L, 3L, "2024-01-01 10:02:00", "b"),
      (1L, 4L, "2024-01-01 10:03:00", "c"),
      (1L, 5L, "2024-01-01 10:04:00", "a"),
      (1L, 6L, "2024-01-01 10:05:00", "b"),
      (1L, 7L, "2024-01-01 10:06:00", "c"))
      .toDF("u", "eid", "ts_s", "et")
      .selectExpr("u", "eid", "CAST(ts_s AS TIMESTAMP) AS ts", "et")
    val q = Sequence.seqMatch(df, "u", "et", "ts", "eid",
      Seq("a", "b", "c"),
      Seq(expr("INTERVAL 10 MINUTES"), expr("INTERVAL 10 MINUTES")))
    assert(q.as[(Long, Long)].collect().toSet == Set((2L, 1L)))
    // all k−1 leads ride ONE key-partitioned sort: a single exchange
    // before the histogram's (which aggregates ≤|keys| rows)
    val plan = q.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size <= 3, plan)
    assert("Window".r.findAllIn(plan).size == 1, plan)
  }
}
