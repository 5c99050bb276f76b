package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeTrainerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  /** Plain-Scala reference: greedy leftmost non-overlapping merge of
    * (x, y) in a symbol list — the semantics the `|sym|` string
    * encoding must reproduce via literal replace. */
  private def mergeRef(syms: List[String], x: String,
      y: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == x && syms(i + 1) == y) {
        out += x + y; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  /** Sequential reference BPE trainer over word counts. */
  private def trainRef(words: Map[String, Long],
      iters: Int): Seq[(String, String, Long)] = {
    var tbl = words.map { case (w, c) => (w.map(_.toString).toList, c) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 1 to iters) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      tbl.foreach { case (syms, c) =>
        syms.zip(syms.drop(1)).foreach { p =>
          pairs(p) = pairs.getOrElse(p, 0L) + c
        }
      }
      if (pairs.nonEmpty) {
        val ((x, y), pc) = pairs.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head
        out += ((x, y, pc))
        tbl = tbl.map { case (syms, c) => (mergeRef(syms, x, y), c) }
      }
    }
    out.toSeq
  }

  test("hand-computed merges on a tiny corpus") {
    // 'abab' x3, 'ab' x2: pairs (a,b)=8, (b,a)=3 -> merge 1 = (a,b) 8
    // then words are [ab,ab] x3, [ab] x2: merge 2 = (ab,ab) 3
    val docs = Seq((1L, "abab abab abab ab ab")).toDF("doc_id", "text")
    val got = BpeTrainer.train(docs, "text", iters = 2)
      .map(m => (m.left, m.right, m.merged, m.pairCount))
    assert(got == Seq(("a", "b", "ab", 8L), ("ab", "ab", "abab", 3L)))
  }

  test("overlapping runs merge greedily leftmost (aaa -> [aa, a])") {
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val m = BpeTrainer.train(docs, "text", iters = 2)
    // iter 1: (a,a) count 4 (2 per 'aaa' word occurrence... one word
    // type 'aaa' with cnt 2 -> pairs (a,a) weighted 2*2=4)
    assert((m(0).left, m(0).right, m(0).pairCount) == (("a", "a", 4L)))
    // after merge: [aa, a] -> iter 2 best is (aa, a) count 2
    assert((m(1).left, m(1).right, m(1).pairCount) == (("aa", "a", 2L)))
  }

  test("matches the sequential reference on a randomized corpus, " +
      "at any partitioning") {
    val rnd = new scala.util.Random(42)
    val vocab = Seq("spark", "scala", "parquet", "shuffle", "scan",
      "sort", "stream", "state", "store", "batch")
    val textRows = (1 to 60).map { i =>
      (i.toLong, Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val wordCounts = textRows.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, g) => (w, g.size.toLong) }
    val expect = trainRef(wordCounts, 6)
    for (parts <- Seq(1, 7)) {
      val docs = textRows.toDF("doc_id", "text").repartition(parts)
      val got = BpeTrainer.train(docs, "text", iters = 6)
        .map(m => (m.left, m.right, m.pairCount))
      assert(got == expect, s"parts=$parts")
    }
  }

  test("segmentCount applies the learned merges in order") {
    val docs = Seq((1L, "abab abab ab cd")).toDF("doc_id", "text")
    val merges = BpeTrainer.train(docs, "text", iters = 2)
    val got = docs.select(
      BpeTrainer.segmentCount(lit("ababab"), merges).as("a"),
      BpeTrainer.segmentCount(lit("cd"), merges).as("b"),
      BpeTrainer.segmentCount(lit("x"), merges).as("c"))
      .as[(Int, Int, Int)].head()
    // merges: (a,b)->ab, (ab,ab)->abab; 'ababab' -> [abab, ab] = 2
    assert(got == ((2, 2, 1)))
  }

  test("non-alpha tokens are excluded from training") {
    val docs = Seq((1L, "ab ab 123 a|b A-B")).toDF("doc_id", "text")
    val wc = BpeTrainer.wordCounts(docs, "text")
      .as[(String, Long)].collect().toMap
    assert(wc == Map("ab" -> 2L))
  }
}
