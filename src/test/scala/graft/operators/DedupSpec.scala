package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  // two exact dups (0,1), one near-dup pair (2,3), two unrelated (4,5)
  private lazy val corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again"),
    (1L, "the  quick brown fox jumps over the lazy dog again and again "),
    (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
    (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"),
    (4L, "completely different content about spark query engines at scale"),
    (5L, "yet another unrelated document mentioning benchmarks and parquet")
  ).toDF("doc_id", "text")

  test("exact dedup collapses whitespace-normalized duplicates") {
    val kept = Dedup.exact(corpus, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(kept.keySet == Set(0L, 2L, 3L, 4L, 5L))
    assert(kept(0L) == 2L) // docs 0 and 1 collapsed
  }

  test("ngram Jaccard finds the near-dup pair and only it (plus exact)") {
    val pairs = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
      n = 3, threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L))) // exact dup: jaccard 1.0
    assert(pairs.contains((2L, 3L))) // near dup
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhash LSH candidates cover high-jaccard pairs; verify filters") {
    // bands=8 (r=2): collision prob per band = jac^2, miss prob for the
    // 0.82-jaccard pair = (1-0.67)^8 ~ 1e-4 -> deterministic hashes make
    // this a fixed outcome, verified to hold
    val verified = Dedup.minhashDedupPairs(corpus, "doc_id", "text",
      n = 3, k = 16, bands = 8, threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(verified.contains((0L, 1L)))
    assert(verified.contains((2L, 3L)))
    assert(!verified.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhash: identical docs at distance 0; blocked == cross join") {
    val naive = Dedup.simhashPairs(corpus, "doc_id", "text", maxDist = 8)
      .as[(Long, Long, Int)].collect().toSet
    val blocked = Dedup.simhashPairsBlocked(corpus, "doc_id", "text",
      maxDist = 8).as[(Long, Long, Int)].collect().toSet
    assert(naive == blocked)
    assert(naive.exists { case (a, b, d) => a == 0L && b == 1L && d == 0 })
  }

  test("native hashed_shingles is bit-identical to the declarative chain") {
    import org.apache.spark.sql.functions.{col, call_function, lit}
    import graft.functions.TextFunctions
    val docs = spark.read
      .parquet(s"${graft.TestSpark.Sf0001}/documents.parquet")
    val mismatches = docs.select(
      call_function("hashed_shingles",
        TextFunctions.tokens(col("text")), lit(3)).as("a"),
      Dedup.hashedShinglesDeclarative(col("text"), 3).as("b"))
      .filter("a <> b").count()
    assert(mismatches == 0)
  }

  test("native simhash60 is bit-identical to the declarative formulation") {
    val docs = spark.read
      .parquet(s"${graft.TestSpark.Sf0001}/documents.parquet")
    val mismatches = docs.select(
      Dedup.simhash(org.apache.spark.sql.functions.col("text")).as("a"),
      Dedup.simhashDeclarative(
        org.apache.spark.sql.functions.col("text")).as("b"))
      .filter("a <> b").count()
    assert(mismatches == 0)
  }

  test("shingles of short docs are empty, not an error") {
    val tiny = Seq((0L, "one two")).toDF("doc_id", "text")
    assert(Dedup.ngramJaccardPairs(tiny, "doc_id", "text").count() == 0)
  }

  test("duplicateSpans: shared runs merge into maximal spans per doc") {
    val docs = Seq(
      (1L, "a b c d e f"),  // full dup of doc 4
      (2L, "x y a b c z"),  // shares only "a b c"
      (3L, "q r s t u"),    // unique: no spans
      (4L, "a b c d e f")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicateSpans(docs, "doc_id", "text", n = 3)
      .select("doc_id", "span_start", "span_end", "span_len")
      .as[(Long, Int, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // docs 1/4: every 3-gram shared -> ONE maximal span covering 0..5;
    // doc 2: only positions 2..4 (the "a b c" occurrence) are covered
    assert(got == Seq((1L, 0, 5, 6L), (2L, 2, 4, 3L), (4L, 0, 5, 6L)))
  }

  test("dedupLines: lowest (doc, pos) occurrence wins, docs recompose") {
    val docs = Seq(
      (1L, "shared line here.\nunique to one."),
      (2L, "Shared   LINE here.\nanother unique line."), // fp-equal l1
      (3L, "  ")                                         // blank page
    ).toDF("doc_id", "text")
    val got = Dedup.dedupLines(docs, "doc_id", "text")
      .select("doc_id", "n_lines", "n_kept", "clean_text")
      .as[(Long, Int, Long, Option[String])].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 2, 2L, Some("shared line here.\nunique to one.")),
      (2L, 2, 1L, Some("another unique line.")),
      (3L, 0, 0L, None)))
  }

  test("dedupLines: within-doc repeats also collapse to the first") {
    val docs = Seq((7L, "same thing.\nsame thing.\nsame thing."))
      .toDF("doc_id", "text")
    val got = Dedup.dedupLines(docs, "doc_id", "text")
      .select("n_kept", "clean_text").as[(Long, String)].head()
    assert(got == ((1L, "same thing.")))
  }

  test("duplicateSpans: within-doc repetition alone is not a span") {
    val docs = Seq(
      (1L, "p q r p q r p q r"), // repeats internally, but no other doc
      (2L, "entirely different words here")
    ).toDF("doc_id", "text")
    assert(Dedup.duplicateSpans(docs, "doc_id", "text", n = 3)
      .count() == 0)
  }

  test("containment: doc-inside-doc fires asymmetrically where Jaccard " +
      "misses") {
    val small = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, small), // contained whole in 2
      (2L, small + " plus a very long tail of distinct words " +
        "one two three four five six seven eight nine ten eleven " +
        "twelve thirteen fourteen fifteen sixteen seventeen eighteen"),
      (3L, "entirely unrelated content about query engines and parquet")
    ).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.9)
      .as[(Long, Long, Double)].collect()
    // 1 ⊂ 2: containment(1→2) = 1.0; the reverse direction is far below
    assert(cont.map(c => (c._1, c._2)).toSet == Set((1L, 2L)))
    assert(cont.head._3 == 1.0)
    // Jaccard at the same threshold does NOT find it: |A|/|B| is small
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.9).count()
    assert(jac == 0)
  }

  test("containment: equals exhaustive pairwise at the same threshold") {
    // recall-1 claim: the prefix-filtered path reproduces the quadratic
    // definition exactly on a corpus with partial overlaps either side
    // of the threshold
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
      (3L, "a b c d e f g q r s t u v w x y z aa bb cc"),
      (4L, "totally different words in this one here now")
    ).toDF("doc_id", "text")
    val fast = Dedup.containmentPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.6).as[(Long, Long, Double)].collect().toSet
    val sets = Dedup.hashedShingleSets(docs, "doc_id", "text", 3)
      .as[(Long, Seq[Long], Int)].collect()
      .map(r => r._1 -> r._2.toSet).toMap
    val slow = (for {
      (a, ha) <- sets; (b, hb) <- sets if a != b
      c = ha.intersect(hb).size.toDouble / ha.size if c >= 0.6
    } yield (a, b, c)).toSet
    assert(fast == slow)
    assert(fast.nonEmpty)
  }
}
