package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Randomized equivalence for the pattern operators: [[Sequence.seqMatch]]
  * and [[Sequence.nextNode]] vs plain-Scala sequential references over
  * seeded random event logs — dense same-type runs, same-timestamp ties,
  * single-event users, and per-step gap boundaries all arise naturally.
  * The DuckDB oracle proves engine-vs-engine parity on the fixed tables;
  * these prove the OPERATOR SEMANTICS on adversarial shapes. */
class SequencePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private val types = Vector("a", "b", "c", "x")
  private val steps = Seq("a", "b", "c")
  private val gapMin = Seq(7L, 11L) // minutes, per adjacent step pair

  /** (user, eventId, minuteOfDay, type) — ids unique, ts deliberately
    * collides across events so the tiebreak order matters. */
  private def genLog(rnd: Random, users: Int, events: Int)
      : Seq[(Long, Long, Long, String)] =
    (0 until events).map { i =>
      (rnd.nextInt(users).toLong + 1L, i.toLong,
        rnd.nextInt(120).toLong, types(rnd.nextInt(types.size)))
    }

  private def toDf(rows: Seq[(Long, Long, Long, String)]) =
    rows.toDF("u", "eid", "m", "et")
      .select(col("u"), col("eid"),
        timestamp_seconds(
          unix_timestamp(lit("2024-01-01 00:00:00").cast("timestamp")) +
            col("m") * 60).as("ts"),
        col("et"))

  /** Sequential reference: per user, sort by (minute, eid), keep
    * on-pattern types, count anchors whose next k−1 subsequence events
    * carry the step types with each adjacent gap within its bound. */
  private def refSeqMatch(rows: Seq[(Long, Long, Long, String)])
      : Map[Long, Long] =
    rows.groupBy(_._1).flatMap { case (_, evs) =>
      val seq = evs.filter(e => steps.contains(e._4))
        .sortBy(e => (e._3, e._2))
      val n = (0 until seq.size).count { i =>
        seq(i)._4 == steps.head &&
          (1 until steps.size).forall { j =>
            i + j < seq.size && seq(i + j)._4 == steps(j) &&
              seq(i + j)._3 <= seq(i + j - 1)._3 + gapMin(j - 1)
          }
      }
      if (n > 0) Some(n.toLong) else None
    }.groupBy(identity).map { case (k, vs) => (k, vs.size.toLong) }

  /** Sequential reference: per user, full (minute, eid)-sorted
    * timeline; first index where steps run consecutively and a next
    * event exists → that next event's type. */
  private def refNextNode(rows: Seq[(Long, Long, Long, String)])
      : Map[String, Long] =
    rows.groupBy(_._1).flatMap { case (_, evs) =>
      val seq = evs.sortBy(e => (e._3, e._2))
      (0 until seq.size).find { i =>
        i + steps.size < seq.size &&
          steps.zipWithIndex.forall { case (st, j) => seq(i + j)._4 == st }
      }.map(i => seq(i + steps.size)._4)
    }.groupBy(identity).map { case (k, vs) => (k, vs.size.toLong) }

  test("seqMatch == sequential reference over 30 seeded random logs") {
    (1 to 30).foreach { seed =>
      val rnd = new Random(seed)
      val rows = genLog(rnd, users = 1 + rnd.nextInt(6),
        events = 5 + rnd.nextInt(120))
      val got = Sequence.seqMatch(toDf(rows), "u", "et", "ts", "eid",
        steps, gapMin.map(g => expr(s"INTERVAL $g MINUTES")))
        .as[(Long, Long)].collect().toMap
      assert(got == refSeqMatch(rows), s"seed=$seed rows=$rows")
    }
  }

  test("nextNode == sequential reference over 30 seeded random logs") {
    (1 to 30).foreach { seed =>
      val rnd = new Random(seed + 1000)
      val rows = genLog(rnd, users = 1 + rnd.nextInt(6),
        events = 5 + rnd.nextInt(120))
      val got = Sequence.nextNode(toDf(rows), "u", "et", "ts", "eid",
        steps).as[(String, Long)].collect().toMap
      assert(got == refNextNode(rows), s"seed=$seed rows=$rows")
    }
  }

  /** Sequential reference for the SKIP-ALLOWED matcher: an anchor
    * counts iff some strictly-later-in-total-order chain carries the
    * step types with each adjacent matched-pair gap within bound —
    * exhaustive recursive search, no greedy shortcuts. */
  private def refSeqMatchSkip(rows: Seq[(Long, Long, Long, String)])
      : Map[Long, Long] =
    rows.groupBy(_._1).flatMap { case (_, evs) =>
      val seq = evs.filter(e => steps.contains(e._4))
        .sortBy(e => (e._3, e._2))
      def feasible(i: Int, s: Int): Boolean =
        if (s == steps.size) true
        else (i + 1 until seq.size).exists { j =>
          seq(j)._4 == steps(s) &&
            seq(j)._3 <= seq(i)._3 + gapMin(s - 1) && feasible(j, s + 1)
        }
      val n = (0 until seq.size).count { i =>
        seq(i)._4 == steps.head && feasible(i, 1)
      }
      if (n > 0) Some(n.toLong) else None
    }.groupBy(identity).map { case (k, vs) => (k, vs.size.toLong) }

  test("seqMatchSkip == exhaustive reference over 30 seeded random logs") {
    (1 to 30).foreach { seed =>
      val rnd = new Random(seed + 2000)
      val rows = genLog(rnd, users = 1 + rnd.nextInt(6),
        events = 5 + rnd.nextInt(120))
      val got = Sequence.seqMatchSkip(toDf(rows), "u", "et", "ts", "eid",
        steps, gapMin.map(g => expr(s"INTERVAL $g MINUTES")))
        .as[(Long, Long)].collect().toMap
      assert(got == refSeqMatchSkip(rows), s"seed=$seed rows=$rows")
    }
  }

  test("seqMatchSkip survives the cases strict adjacency can't") {
    // 1) intervening on-pattern event between matched steps (the
    //    documented seqMatch limitation): a(0) b(1) b(2) c(5) — the
    //    second 'b' sits between the anchor's 'b' and its 'c', so
    //    strict adjacency sees a,b,b and misses; ClickHouse matches
    //    through either 'b'
    val r1 = Seq((1L, 1L, 0L, "a"), (1L, 2L, 1L, "b"), (1L, 3L, 2L, "b"),
      (1L, 4L, 5L, "c"))
    val gotSkip1 = Sequence.seqMatchSkip(toDf(r1), "u", "et", "ts", "eid",
      steps, gapMin.map(g => expr(s"INTERVAL $g MINUTES")))
      .as[(Long, Long)].collect().toMap
    assert(gotSkip1 == Map(1L -> 1L))
    val gotStrict1 = Sequence.seqMatch(toDf(r1), "u", "et", "ts", "eid",
      steps, gapMin.map(g => expr(s"INTERVAL $g MINUTES")))
      .as[(Long, Long)].collect().toMap
    assert(gotStrict1 == Map.empty[Long, Long])
    // 2) greedy-earliest is wrong, the DP is not: b at minute 1 dies
    //    (c at 13 > 1+11) but b at minute 6 lives (13 <= 6+11); the
    //    anchor must match through the LATER b
    val r2 = Seq((2L, 1L, 0L, "a"), (2L, 2L, 1L, "b"), (2L, 3L, 6L, "b"),
      (2L, 4L, 13L, "c"))
    val gotSkip2 = Sequence.seqMatchSkip(toDf(r2), "u", "et", "ts", "eid",
      steps, gapMin.map(g => expr(s"INTERVAL $g MINUTES")))
      .as[(Long, Long)].collect().toMap
    assert(gotSkip2 == Map(1L -> 1L))
  }

  test("seqMatch is insertion-order independent") {
    val rnd = new Random(7)
    val rows = genLog(rnd, users = 4, events = 80)
    val a = Sequence.seqMatch(toDf(rows), "u", "et", "ts", "eid",
      steps, gapMin.map(g => expr(s"INTERVAL $g MINUTES")))
      .collect().toSet
    val b = Sequence.seqMatch(toDf(rows.reverse), "u", "et", "ts", "eid",
      steps, gapMin.map(g => expr(s"INTERVAL $g MINUTES")))
      .collect().toSet
    assert(a == b)
  }
}
