package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The scale harness's claims about its own blow-up construction —
  * disjoint id ranges, preserved within-copy duplicate structure,
  * destroyed cross-copy similarity — and the exactness of the
  * candidate counter it uses as range-join evidence. */
class BenchScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again", "en", "web", 50L),
    (2L, "the quick brown fox jumps over the lazy dog again", "en", "web", 50L),
    (3L, "entirely different content about spark and scale tests", "en", "web", 55L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("blowUpDocuments: ×n rows, disjoint ids, copy 0 untouched") {
    val up = BenchScale.blowUpDocuments(docs, 3).cache()
    assert(up.count() == 9)
    assert(up.select("doc_id").distinct().count() == 9)
    val orig = up.filter(col("doc_id") < 100L).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(orig(1L).startsWith("the quick brown fox"))
  }

  test("blowUpDocuments: within-copy duplicates preserved, none across copies") {
    val up = BenchScale.blowUpDocuments(docs, 3)
    val fpOf = up.select(col("doc_id"), md5(col("text")).as("fp"))
      .as[(Long, String)].collect().toMap
    for (i <- 0 until 3) {
      val off = i.toLong * 100000000L
      assert(fpOf(1L + off) == fpOf(2L + off),
        s"copy $i lost its internal duplicate pair")
    }
    // docs 1 across copies must NOT collide (rotation changed the text)
    assert(Set(fpOf(1L), fpOf(1L + 100000000L),
      fpOf(1L + 200000000L)).size == 3)
  }

  test("blowUpEvents: ×n rows with disjoint event and user ids") {
    val ev = Seq((1L, 1000L, 10L, "click", 1.0, "{}"),
        (2L, 2000L, 11L, "purchase", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val up = BenchScale.blowUpEvents(ev, 4).cache()
    assert(up.count() == 8)
    assert(up.select("event_id").distinct().count() == 8)
    assert(up.select("user_id").distinct().count() == 8)
    // timestamps untouched: per-copy time profile identical
    assert(up.filter(col("ts") === 1000L).count() == 4)
  }

  test("intervalCandidates: exact cell-sum, upper-bounds the join output") {
    val l = Seq((1L, 100L, 1L), (1L, 150L, 2L), (2L, 100L, 3L))
      .toDF("k", "ts", "id")
    val r = Seq((1L, 120L, 4L), (1L, 260L, 5L), (2L, 500L, 6L))
      .toDF("k", "ts", "id")
    val cands = BenchScale.intervalCandidates(l, r, Seq("k"), "ts", "ts",
      lower = 0L, upper = 100L)
    val out = operators.RangeJoin.intervalJoin(l, r, Seq("k"), "ts", "ts",
      lower = 0L, upper = 100L).count()
    assert(cands >= out, s"candidates $cands must cover output $out")
    // hand-count, width 100: left (k1,100) and (k1,150) both touch
    // buckets {1,2}; right (k1,120)->b1, (k1,260)->b2, (k2,500)->b5.
    // cells (k1,b1): 2·1, (k1,b2): 2·1 -> 4 candidates; the exact
    // predicate keeps only (l1, r4): 120 ∈ (100, 200].
    assert(cands == 4)
    assert(out == 1)
  }
}
