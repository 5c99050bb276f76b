package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Randomized equivalence: the distributed span/line dedup operators vs
  * plain-Scala sequential references, over seeded word-soup corpora with
  * planted duplication. The DuckDB oracle proves engine-vs-engine parity
  * on the fixed test tables; these prove the OPERATOR SEMANTICS on
  * corpora with adversarial shapes (heavy overlap, tiny docs, repeated
  * n-grams, shared lines at varied positions). */
class DedupPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta")

  private def genDoc(rnd: Random, words: Int): String =
    Seq.fill(words)(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  // ---------------------------------------------------------- spans

  /** Sequential reference for duplicateSpans: n-gram string multiset per
    * doc, dup = n-gram string in ≥2 docs, covered positions, merged
    * runs. Hashes are not needed — 60-bit collisions on these tiny
    * vocabularies would show up as a diff, which is part of the point. */
  private def refSpans(docs: Seq[(Long, String)], n: Int)
      : Set[(Long, Int, Int, Long)] = {
    val grams: Seq[(Long, Int, String)] = docs.flatMap { case (id, t) =>
      val toks = t.trim.split("\\s+").filter(_.nonEmpty).toSeq
      if (toks.size < n) Seq.empty
      else (0 to toks.size - n).map(i =>
        (id, i, toks.slice(i, i + n).mkString(" ")))
    }
    val dup = grams.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2)
      .keySet
    val covered: Map[Long, Seq[Int]] = grams
      .filter(g => dup.contains(g._3))
      .flatMap { case (id, pos, _) => (pos until pos + n).map(id -> _) }
      .distinct.groupBy(_._1).map { case (id, ps) =>
        id -> ps.map(_._2).sorted }
    covered.flatMap { case (id, ps) =>
      // merge consecutive runs
      ps.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, p) if p == e + 1 => (s, p) :: rest
        case (acc, p) => (p, p) :: acc
      }.map { case (s, e) => (id, s, e, (e - s + 1).toLong) }
    }.toSet
  }

  test("property: duplicateSpans == sequential reference (12 seeds)") {
    for (seed <- 0 until 12) {
      val rnd = new Random(seed)
      val nDocs = 4 + rnd.nextInt(8)
      val docs = (0L until nDocs).map(i =>
        (i, genDoc(rnd, 1 + rnd.nextInt(14))))
      val got = Dedup.duplicateSpans(docs.toDF("doc_id", "text"),
          "doc_id", "text", n = 3)
        .as[(Long, Int, Int, Long)].collect().toSet
      assert(got == refSpans(docs, 3), s"seed=$seed docs=$docs")
    }
  }

  // ---------------------------------------------------------- lines

  /** Sequential reference for dedupLines: iterate docs in (doc, pos)
    * order, keep a line iff its normalized form is unseen. */
  private def refLines(docs: Seq[(Long, String)])
      : Map[Long, (Int, Long, Option[String])] = {
    def norm(l: String) =
      l.trim.replaceAll("\\s+", " ").toLowerCase
    val seen = scala.collection.mutable.Set.empty[String]
    docs.sortBy(_._1).map { case (id, t) =>
      val lines = if (t.trim.isEmpty) Seq.empty[String]
        else t.split("\n", -1).toSeq
      val kept = lines.filter(l => seen.add(norm(l)))
      id -> ((lines.size, kept.size.toLong,
        if (kept.isEmpty) None else Some(kept.mkString("\n"))))
    }.toMap
  }

  test("property: dedupLines == sequential first-seen replay (12 seeds)") {
    for (seed <- 50 until 62) {
      val rnd = new Random(seed)
      // lines drawn from a small pool so cross-doc and within-doc
      // repeats are common; random casing exercises normalization
      val pool = Vector.fill(6)(genDoc(rnd, 1 + rnd.nextInt(4)))
      def line(): String = {
        val l = pool(rnd.nextInt(pool.size))
        if (rnd.nextBoolean()) l.toUpperCase else l
      }
      val docs = (0L until (3 + rnd.nextInt(5))).map { i =>
        (i, Seq.fill(1 + rnd.nextInt(5))(line()).mkString("\n"))
      }
      val got = Dedup.dedupLines(docs.toDF("doc_id", "text"),
          "doc_id", "text")
        .as[(Long, Int, Long, Option[String])].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got == refLines(docs), s"seed=$seed docs=$docs")
    }
  }
}
