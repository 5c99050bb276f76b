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
