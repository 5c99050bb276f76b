package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def reference(docs: Seq[(Long, Long)],
      budget: Long): Seq[(Long, Long, Long, Long)] = {
    var cum = 0L
    docs.sortBy(_._1).map { case (id, tok) =>
      val off = cum; cum += tok; (id, tok, off, off / budget)
    }
  }

  private def run(docs: Seq[(Long, Long)], budget: Long, parts: Int) =
    Packing.packByBudget(docs.toDF("doc_id", "n_tok"), "doc_id", "n_tok",
        budget, partitions = parts)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)

  test("offsets and bins match the sequential reference") {
    val rnd = new Random(7)
    val docs = rnd.shuffle((1L to 500L).toVector)
      .map(id => (id, rnd.nextInt(300).toLong))
    assert(run(docs, budget = 1000L, parts = 4) == reference(docs, 1000L))
  }

  test("result is invariant to the partition count") {
    val rnd = new Random(8)
    val docs = (1L to 300L).map(id => (id, rnd.nextInt(100).toLong))
    val expect = reference(docs, 512L)
    for (p <- Seq(1, 3, 7, 16))
      assert(run(docs, 512L, p) == expect, s"partitions=$p")
  }

  test("a doc can straddle a boundary; its bin is where it starts") {
    // budget 10: doc 1 (7 toks) -> bin 0; doc 2 (9) starts at 7 -> bin 0;
    // doc 3 starts at 16 -> bin 1
    val got = run(Seq((1L, 7L), (2L, 9L), (3L, 2L)), 10L, 2)
    assert(got.map(r => (r._1, r._4)) == Seq((1L, 0L), (2L, 0L), (3L, 1L)))
  }

  test("zero-token docs share the running offset, empty input is empty") {
    val got = run(Seq((1L, 0L), (2L, 0L), (3L, 5L)), 10L, 2)
    assert(got.map(_._3) == Seq(0L, 0L, 0L))
    assert(run(Seq.empty, 10L, 2).isEmpty)
  }
}
