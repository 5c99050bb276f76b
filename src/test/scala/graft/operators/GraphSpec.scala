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

  test("triangles: K4 yields its four triangles, each listed once") {
    import spark.implicits._
    val k4 = (for { i <- 0 to 3; j <- 0 to 3 if i < j } yield
      (i.toLong, j.toLong)).toDF("a", "b")
    val tris = Graph.triangles(k4).as[(Long, Long, Long)]
      .collect().toSet
    assert(tris.size == 4)
    // each triangle's vertex set is distinct
    assert(tris.map { case (x, y, z) => Set(x, y, z) }.size == 4)
    val counts = Graph.triangleCounts(k4)
      .as[(Long, Long)].collect().toMap
    assert(counts == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("triangles: duplicates and reversed edges don't double-count") {
    import spark.implicits._
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L))
      .toDF("a", "b")
    assert(Graph.triangles(messy).count() == 1)
  }

  test("triangles: star (pure hub skew) has none; wedge join stays sane") {
    import spark.implicits._
    val star = (1L to 50L).map(i => (0L, i)).toDF("a", "b")
    assert(Graph.triangles(star).count() == 0)
  }

  test("triangles match a naive id-oriented formulation on a random graph") {
    import spark.implicits._
    // deterministic pseudo-random graph
    val edges = (0 until 400).map { i =>
      val a = (i * 31 + 7) % 40; val b = (i * 17 + 3) % 40
      (math.min(a, b).toLong, math.max(a, b).toLong)
    }.filter(p => p._1 != p._2).distinct
    val df = edges.toDF("a", "b")
    val got = Graph.triangles(df).count()
    val set = edges.toSet
    val naive = (for {
      (x, y) <- edges; z <- (y + 1) to 39L
      if set.contains((y, z)) && set.contains((x, z))
    } yield (x, y, z)).size
    assert(got == naive)
  }
}
