package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class ClusteringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  /** Driver-side union-find reference. */
  private def ufLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(x => x -> find(x)).toMap
  }

  private def ccLabels(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Clustering.connectedComponents(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap

  test("long chain collapses to its minimum (O(log n) rounds, not O(n))") {
    val chain = (1L until 64L).map(i => (i, i + 1))
    val got = ccLabels(chain)
    assert(got.keySet == (1L to 64L).toSet)
    assert(got.values.toSet == Set(1L))
  }

  test("fixpoint is certified exactly (multi-round run, labels unchanged)") {
    Clustering.lastStats = Clustering.CcStats(0, certified = false)
    val chain = (1L until 32L).map(i => (i, i + 1))
    val got = ccLabels(chain)
    assert(got.values.toSet == Set(1L))
    val stats = Clustering.lastStats
    // a 32-chain cannot converge in one star round — the exact
    // exceptAll certificate must have run at the detected fixpoint
    assert(stats.rounds >= 2, s"expected >=2 rounds, got ${stats.rounds}")
    assert(stats.certified, "exact fixpoint certificate did not run")
  }

  test("disjoint structures: star, triangle, isolated edge") {
    val edges = Seq((10L, 11L), (10L, 12L), (10L, 13L), // star at 10
      (20L, 21L), (21L, 22L), (22L, 20L),               // cycle
      (30L, 31L))
    val got = ccLabels(edges)
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 30L -> 30L, 31L -> 30L))
  }

  test("random graphs match union-find (components = min reachable id)") {
    for (seed <- 1 to 4) {
      val rnd = new Random(seed)
      val n = 80
      val edges = (1 to 120).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      assert(ccLabels(edges) == ufLabels(edges), s"seed=$seed")
    }
  }

  test("self-loops and duplicate/reversed edges are harmless") {
    val got = ccLabels(Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (2L, 4L)))
    // 3's only edge is a self-loop -> it never appears in the graph
    assert(got == Map(1L -> 1L, 2L -> 1L, 4L -> 1L))
  }

  test("canonicalize labels every doc and keeps one per cluster") {
    val docs = (1L to 10L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("a", "b")
    val out = Clustering.canonicalize(docs, pairs, "doc_id")
      .select("doc_id", "cluster_id", "keep")
      .as[(Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    val expect = Seq(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (4L, 4L, true), (5L, 5L, true), (6L, 6L, true),
      (7L, 7L, true), (8L, 8L, true), (9L, 7L, false), (10L, 10L, true))
    assert(out == expect)
    // the deduplicated corpus: one survivor per cluster
    assert(out.count(_._3) == 7)
  }
}
