package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  // star: hub 1 ↔ spokes 2,3,4; node 5 isolated
  private lazy val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
  private lazy val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
  private lazy val edges = Graph.symmetrize(pairs, "a", "b")

  /** Driver-side reference replay with the same integer arithmetic. */
  private def reference(iters: Int): Map[Long, Long] = {
    val out = Map(1L -> Seq(2L, 3L, 4L), 2L -> Seq(1L), 3L -> Seq(1L),
      4L -> Seq(1L))
    var rank = Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L,
      4L -> 1000000L, 5L -> 1000000L)
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      out.foreach { case (u, vs) =>
        val c = rank(u) / vs.size
        vs.foreach(v => contrib(v) += c)
      }
      rank = rank.keys.map(v => v -> (150000L + 85L * contrib(v) / 100L))
        .toMap
    }
    rank
  }

  test("star graph matches the integer reference replay exactly") {
    val got = Graph.pageRank(nodes, edges, iterations = 5)
      .as[(Long, Long)].collect().toMap
    assert(got == reference(5))
    // structure: hub outranks spokes, spokes outrank the isolate
    assert(got(1L) > got(2L) && got(2L) == got(3L) && got(3L) == got(4L))
    assert(got(2L) > got(5L))
  }

  test("isolated node settles at the teleport mass") {
    val got = Graph.pageRank(nodes, edges, iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(got(5L) == 150000L)
  }

  test("ranks are exact integers: invariant under repartitioning") {
    val a = Graph.pageRank(nodes, edges, iterations = 4)
      .as[(Long, Long)].collect().toMap
    val b = Graph.pageRank(nodes.repartition(5), edges.repartition(7),
      iterations = 4).as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("mass is bounded: teleport floor, never above the start mass") {
    val got = Graph.pageRank(nodes, edges, iterations = 5)
      .as[(Long, Long)].collect()
    got.foreach { case (id, r) =>
      assert(r >= 150000L, s"node $id below teleport")
    }
    // integer floors only ever LOSE mass vs the float fixpoint
    assert(got.map(_._2).sum <= 5L * 1000000L)
  }
}
