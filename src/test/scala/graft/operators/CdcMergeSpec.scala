package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** MERGE semantics vs a naive sequential-replay oracle: the reference
  * applies events one at a time in arrival order (river/sync.go:116-178);
  * our set-oriented merge must produce the identical final state for any
  * event sequence, partitioning, and batch split. Seeded random sequences
  * keep the property runs reproducible. */
class CdcMergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private case class Ev(seq: Long, op: String, k: Int, v: String)

  /** The oracle: replay events in seq order into a Map, like the
    * reference's single-threaded sync loop. */
  private def naiveReplay(evs: Seq[Ev]): Map[Int, String] =
    evs.sortBy(_.seq).foldLeft(Map.empty[Int, String]) { (state, e) =>
      e.op match {
        case "D" => state - e.k
        case _ => state + (e.k -> e.v)
      }
    }

  private def genEvents(rnd: Random, n: Int, seqOffset: Long = 0): List[Ev] =
    List.tabulate(n) { i =>
      Ev(seqOffset + i,
        rnd.shuffle(List("I", "I", "U", "D")).head,
        rnd.nextInt(10),
        rnd.alphanumeric.take(5).mkString)
    }

  test("property: lastWriteWins == naive sequential replay (20 seeds)") {
    for (seed <- 0 until 20) {
      val rnd = new Random(seed)
      val evs = genEvents(rnd, 1 + rnd.nextInt(60))
      val df = evs.map(e => (e.seq, e.op, e.k, e.v)).toDF("seq", "op", "k", "v")
        .select($"k", $"v", $"op".as("_op"), $"seq".as("_seq"))
        .repartition(4) // any partitioning must give the same answer
      val got = CdcMerge.lastWriteWins(df, Seq("k"))
        .as[(Int, String)].collect().toMap
      assert(got == naiveReplay(evs), s"seed=$seed")
    }
  }

  test("property: applyChanges == naive replay of snapshot + stream") {
    for (seed <- 100 until 115) {
      val rnd = new Random(seed)
      val a = genEvents(rnd, rnd.nextInt(40))
      val b = genEvents(rnd, 1 + rnd.nextInt(40), seqOffset = a.size)
      val snapshotState = naiveReplay(a)
      val snapshot = snapshotState.toSeq.toDF("k", "v")
      // target rows act like inserts predating every change event
      val expected = naiveReplay(
        snapshotState.toSeq.map { case (k, v) => Ev(-1, "I", k, v) }
          .toList ++ b)
      val changes = b.map(e => (e.seq, e.op, e.k, e.v)).toDF("seq", "op", "k", "v")
        .select($"k", $"v", $"op".as("_op"), $"seq".as("_seq"))
        .repartition(3)
      val got = CdcMerge.applyChanges(snapshot, changes, Seq("k"))
        .as[(Int, String)].collect().toMap
      assert(got == expected, s"seed=$seed")
    }
  }

  test("scalacheck: lastWriteWins == naive replay over generated streams") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genEvs: Gen[List[Ev]] = for {
      n <- Gen.chooseNum(1, 50)
      raw <- Gen.listOfN(n, for {
        op <- Gen.oneOf("I", "U", "D")
        k <- Gen.chooseNum(0, 7)
        v <- Gen.stringOfN(4, Gen.alphaChar)
      } yield (op, k, v))
    } yield raw.zipWithIndex.map { case ((op, k, v), i) =>
      Ev(i.toLong, op, k, v)
    }
    val prop = Prop.forAll(genEvs) { evs =>
      val df = evs.map(e => (e.seq, e.op, e.k, e.v))
        .toDF("seq", "op", "k", "v")
        .select($"k", $"v", $"op".as("_op"), $"seq".as("_seq"))
        .repartition(2)
      CdcMerge.lastWriteWins(df, Seq("k"))
        .as[(Int, String)].collect().toMap == naiveReplay(evs)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("applyChanges batch path is one shuffle (single window collapse)") {
    val target = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val changes = Seq((1, "a2", "U", 10L), (3, "c", "I", 12L))
      .toDF("k", "v", "_op", "_seq")
    val plan = CdcMerge.applyChanges(target, changes, Seq("k"))
      .queryExecution.executedPlan.toString
    // the merge is a union + ONE latest-by-key collapse: exactly one
    // key exchange, one WindowGroupLimit pair (partial+final), no join
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("Join"), plan)
  }

  test("property: broadcast path == batch path over random streams") {
    for (seed <- 300 until 312) {
      val rnd = new Random(seed)
      val a = genEvents(rnd, rnd.nextInt(30))
      val b = genEvents(rnd, 1 + rnd.nextInt(30), seqOffset = a.size)
      val snapshot = naiveReplay(a).toSeq.toDF("k", "v")
      val changes = b.map(e => (e.seq, e.op, e.k, e.v))
        .toDF("seq", "op", "k", "v")
        .select($"k", $"v", $"op".as("_op"), $"seq".as("_seq"))
        .repartition(3)
      val batch = CdcMerge.applyChanges(snapshot, changes, Seq("k"))
        .as[(Int, String)].collect().toMap
      val micro = CdcMerge.applyChanges(snapshot, changes, Seq("k"),
        broadcastChanges = true).as[(Int, String)].collect().toMap
      assert(batch == micro, s"seed=$seed")
    }
  }

  test("applyChanges broadcast path == batch path (micro-batch shape)") {
    val target = Seq((1, "a"), (2, "b"), (4, "d")).toDF("k", "v")
    val changes = Seq((1, "a2", "U", 10L), (2, null, "D", 11L),
      (3, "c", "I", 12L), (3, "c2", "U", 13L)).toDF("k", "v", "_op", "_seq")
    val batch = CdcMerge.applyChanges(target, changes, Seq("k"))
      .as[(Int, String)].collect().toMap
    val micro = CdcMerge.applyChanges(target, changes, Seq("k"),
      broadcastChanges = true).as[(Int, String)].collect().toMap
    assert(batch == micro)
    assert(batch == Map(1 -> "a2", 3 -> "c2", 4 -> "d"))
    // the broadcast path must not shuffle the target: its only window
    // exchange is over the (tiny) change set
    val plan = CdcMerge.applyChanges(target, changes, Seq("k"),
      broadcastChanges = true).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("ignore flags drop ops before merge (reference default posture)") {
    val target = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val changes = Seq((1, "a2", "U", 10L), (2, null, "D", 11L),
      (3, "c", "I", 12L)).toDF("k", "v", "_op", "_seq")
    val insertOnly = CdcMerge.applyChanges(target, changes, Seq("k"),
      ignoreUpdates = true, ignoreDeletes = true)
      .as[(Int, String)].collect().toMap
    assert(insertOnly == Map(1 -> "a", 2 -> "b", 3 -> "c"))
  }

  test("changedColumns emits only before!=after names, null-safe") {
    val updates = Seq(
      (1, ("x", "p"), ("x", "q")), // only c2 changed
      (2, ("x", null: String), ("x", null: String)), // nothing changed
      (3, (null: String, "p"), ("x", "p")) // c1 null -> value
    ).toDF("k", "before", "after")
      .select($"k",
        $"before".cast("struct<c1:string,c2:string>").as("before"),
        $"after".cast("struct<c1:string,c2:string>").as("after"))
    val got = CdcMerge.changedColumns(updates, Seq("k"), Seq("c2", "c1"))
      .as[(Int, String)].collect().toMap
    assert(got == Map(1 -> "c2", 2 -> "", 3 -> "c1"))
  }

  test("PK-change update becomes delete(old-key) + insert(new-key)") {
    // key 1 renamed to key 9 (PK change); key 2 updated in place
    val updates = Seq(
      ((1, "a"), (9, "a2"), 100L),
      ((2, "b"), (2, "b2"), 101L)
    ).toDF("before", "after", "_seq")
      .select(
        $"before".cast("struct<k:int,v:string>").as("before"),
        $"after".cast("struct<k:int,v:string>").as("after"),
        $"_seq")
    val events = CdcMerge.normalizeUpdates(updates, Seq("k"), Seq("k", "v"))
    val target = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val got = CdcMerge.applyChanges(target, events, Seq("k"))
      .as[(Int, String)].collect().toMap
    // old key 1 deleted, new key 9 inserted, key 2 updated, key 3 intact
    assert(got == Map(9 -> "a2", 2 -> "b2", 3 -> "c"))
  }

  test("composite primary keys merge on all key columns") {
    val target = Seq((1, "x", "v1"), (1, "y", "v2"), (2, "x", "v3"))
      .toDF("k1", "k2", "v")
    val changes = Seq(
      (1, "x", "v1new", "U", 10L),
      (2, "x", null, "D", 11L),
      (2, "y", "v4", "I", 12L)
    ).toDF("k1", "k2", "v", "_op", "_seq")
    val got = CdcMerge.applyChanges(target, changes, Seq("k1", "k2"))
      .as[(Int, String, String)].collect().toSet
    assert(got == Set((1, "x", "v1new"), (1, "y", "v2"), (2, "y", "v4")))
  }

  test("opCounts matches stream composition") {
    val changes = Seq(("I", 1L), ("I", 2L), ("U", 3L), ("D", 4L))
      .toDF("_op", "_seq").withColumn("k", lit(1))
    val got = CdcMerge.opCounts(changes).as[(String, Long)].collect().toMap
    assert(got == Map("I" -> 2L, "U" -> 1L, "D" -> 1L))
  }

  test("bootstrap handoff: an overlapping suffix tail replayed over the " +
      "snapshot reproduces the full replay for every cut") {
    // feed per key k: I@k0 v1, U@k1 v2, (k=2: D@k2) — try every
    // (snapshot W, tail start B ≤ W) split and demand the merged state
    // equal the full replay; this pins the suffix-tail idempotence
    // argument (a replayed stale event can never clobber newer
    // snapshot state because its successors ride the same suffix)
    val feed = Seq(
      (1, "v1", "I", 10L), (1, "v2", "U", 11L),
      (2, "w1", "I", 20L), (2, "w2", "U", 21L), (2, null, "D", 22L),
      (3, "x1", "I", 30L)
    ).toDF("k", "v", "_op", "_seq")
    val full = CdcMerge.lastWriteWins(feed, Seq("k"))
      .as[(Int, String)].collect().toSet
    for (w <- Seq(10L, 11L, 21L, 30L); b <- Seq(0L, 10L, 11L, 20L)
         if b <= w) {
      val snapshot = CdcMerge.lastWriteWins(
        feed.filter($"_seq" <= w), Seq("k"))
      val tail = feed.filter($"_seq" > b)
      val got = CdcMerge.applyChanges(snapshot, tail, Seq("k"))
        .as[(Int, String)].collect().toSet
      assert(got == full, s"W=$w B=$b")
    }
  }
}
