package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def quadratic(l: DataFrame, r: DataFrame, k: Int): Set[(Long, Long, Int)] =
    l.crossJoin(r)
      .withColumn("dist", levenshtein(col("l_s"), col("r_s")))
      .filter(col("dist") <= k)
      .select(col("l_id"), col("r_id"), col("dist"))
      .as[(Long, Long, Int)].collect().toSet

  private def fuzzy(l: DataFrame, r: DataFrame, k: Int, q: Int = 3): Set[(Long, Long, Int)] =
    FuzzyJoin.join(l, "l_id", "l_s", r, "r_id", "r_s", k, q)
      .as[(Long, Long, Int)].collect().toSet

  test("hand-checked pairs at k=1: deletions, substitutions, misses") {
    val l = Seq((1L, "chocolate lace"), (2L, "golden lavender"),
      (3L, "navy mint")).toDF("l_id", "l_s")
    val r = Seq((10L, "chocolate lace"), (11L, "chocolate lach"),
      (12L, "chocolat lace"), (13L, "golden lavendex"),
      (14L, "navy mint extra")).toDF("r_id", "r_s")
    assert(fuzzy(l, r, 1) == Set(
      (1L, 10L, 0), (1L, 11L, 1), (1L, 12L, 1), (2L, 13L, 1)))
  }

  test("equals the quadratic join on randomized perturbed strings") {
    val rnd = new scala.util.Random(42)
    val words = Seq("almond", "antique", "blue", "coral", "dim",
      "floral", "goldenrod", "lace", "mint", "navy", "plum", "rose")
    def name(): String =
      Seq.fill(2 + rnd.nextInt(3))(words(rnd.nextInt(words.size)))
        .mkString(" ")
    def perturb(s: String): String = rnd.nextInt(3) match {
      case 0 => val p = rnd.nextInt(s.length); s.take(p) + s.drop(p + 1)
      case 1 => val p = rnd.nextInt(s.length)
        s.take(p) + ('a' + rnd.nextInt(26)).toChar + s.drop(p)
      case _ => val p = rnd.nextInt(s.length)
        s.take(p) + ('a' + rnd.nextInt(26)).toChar + s.drop(p + 1)
    }
    val base = (1L to 60L).map(i => (i, name()))
    val dirty = base.map { case (i, s) =>
      (i + 1000L, if (i % 2 == 0) perturb(s) else perturb(perturb(s)))
    }
    val l = dirty.toDF("l_id", "l_s")
    val r = base.toDF("r_id", "r_s")
    for (k <- Seq(1, 2)) {
      assert(fuzzy(l, r, k) == quadratic(l, r, k), s"k=$k diverged")
    }
  }

  test("short strings (below the prefix-lemma floor) still join: brute bucket") {
    // with q=3, k=2 the lemma needs |s| >= k*q + q = 9; these evade it
    val l = Seq((1L, "ab"), (2L, "abcd"), (3L, "xyzuvw")).toDF("l_id", "l_s")
    val r = Seq((10L, "ba"), (11L, "abce"), (12L, "xyzuv"),
      (13L, "completely different")).toDF("r_id", "r_s")
    for (k <- Seq(1, 2)) {
      assert(fuzzy(l, r, k) == quadratic(l, r, k), s"k=$k diverged")
    }
  }

  test("duplicate-heavy short corpus: pair-set equal to quadratic, " +
      "candidates track DISTINCT strings not rows") {
    // 1200 rows over 40 distinct <= 5-char names (30 dups each) — the
    // workload where a row-level short-bucket cross goes quadratic in
    // rows. Names are "XXYY" doubles (pairwise dist >= 2) plus a few
    // designed dist-1 neighbors so recall beyond identity is exercised.
    val doubles = (0 until 36).map { i =>
      val a = ('a' + i / 6).toChar; val b = ('a' + i % 6).toChar
      s"$a$a$b$b"
    }
    // recall corpus: add designed dist-1 neighbors (aab~aabb,
    // aabb!~aabb, zz~zzz) so short-bucket recall beyond identity is on
    // the line, and gate pair-set equality with the quadratic join
    val names = doubles ++ Seq("aab", "aabb!", "zz", "zzz")
    val rows = (1L to 1200L).map(i => (i, names((i % 40).toInt)))
    val l = rows.toDF("l_id", "l_s")
    val r = rows.map { case (i, s) => (i + 10000L, s) }.toDF("r_id", "r_s")
    assert(fuzzy(l, r, 1) == quadratic(l, r, 1))
    // structural corpus: "XXYY" doubles are pairwise dist >= 2 AND
    // gram-disjoint unless identical, so EVERY candidate must be a
    // real match (the short bucket verifies at the string grain) —
    // a row-level cross would emit 1200x1200 candidates
    val cleanRows = (1L to 1200L).map(i => (i, doubles((i % 36).toInt)))
    val cl = cleanRows.toDF("l_id", "l_s")
    val cr = cleanRows.map { case (i, s) => (i + 10000L, s) }
      .toDF("r_id", "r_s")
    val cands = FuzzyJoin.candidatePairs(cl, "l_id", "l_s",
      cr, "r_id", "r_s", maxDist = 1).count()
    val matches = quadratic(cl, cr, 1).size.toLong
    assert(cands == matches,
      s"candidates=$cands should equal matches=$matches, not rows²")
  }

  test("empty gram overlap at distance > k produces no pair") {
    val l = Seq((1L, "aaaaaaaaaaaa")).toDF("l_id", "l_s")
    val r = Seq((10L, "bbbbbbbbbbbb")).toDF("r_id", "r_s")
    assert(fuzzy(l, r, 2).isEmpty)
  }

  test("candidate volume is prefix-bounded: each string posts k*q+1 grams") {
    // indirect structural check: identical long strings repeated many
    // times share every gram, but each posts only k*q+1 = 4 prefix
    // entries, so the posting table stays linear in rows
    val n = 200
    val l = (1L to n.toLong).map(i => (i, s"shared common payload $i"))
      .toDF("l_id", "l_s")
    val counted = FuzzyJoin.join(l, "l_id", "l_s",
      l.select(col("l_id").as("r_id"), col("l_s").as("r_s")),
      "r_id", "r_s", 1)
    // i vs i always matches at dist 0; i vs j only when the numeric
    // suffix is 1 edit away — sanity: self pairs all present
    val got = counted.as[(Long, Long, Int)].collect()
    assert(got.count(p => p._1 == p._2 && p._3 == 0) == n)
  }
}
