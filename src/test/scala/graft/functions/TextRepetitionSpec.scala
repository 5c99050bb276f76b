package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** The Gopher repetition signals run through the sorted run-length fold
  * (TextFunctions.runFold) — this spec pins the fold to a plain-Scala
  * reference of the published definitions, both on hand-built edge
  * cases and on randomized small-vocabulary texts (small vocab forces
  * many equal runs, the path the fold must get right). */
class TextRepetitionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  // ---- plain-Scala reference implementations of the definitions ----

  private def lines(text: String): Seq[String] =
    text.split("\n", -1).toSeq.map(TextRef.sparkTrim).filter(_.nonEmpty)

  private def toks(text: String): Seq[String] =
    TextRef.tokens(text)

  private def ngrams(text: String, n: Int): Seq[String] = {
    val t = toks(text)
    if (t.length < n) Seq.empty
    else t.sliding(n).map(_.mkString(" ")).toSeq
  }

  private def refDupLineFrac(text: String): Double = {
    val ls = lines(text)
    if (ls.isEmpty) 0.0
    else (ls.size - ls.distinct.size).toDouble / ls.size
  }

  private def refDupLineCharFrac(text: String): Double = {
    val ls = lines(text)
    val total = ls.map(_.length.toLong).sum
    if (total == 0) 0.0
    else {
      val dup = ls.groupBy(identity).collect {
        case (l, occ) if occ.size > 1 => occ.size.toLong * l.length
      }.sum
      dup.toDouble / total
    }
  }

  private def refTopNgramFrac(text: String, n: Int): Double = {
    val ng = ngrams(text, n)
    if (ng.isEmpty || text.isEmpty) 0.0
    else {
      val best = ng.groupBy(identity)
        .map { case (g, occ) => occ.size.toLong * g.length }.max
      math.min(best.toDouble / text.length, 1.0)
    }
  }

  private def refDupNgramFrac(text: String, n: Int): Double = {
    val ng = ngrams(text, n)
    if (ng.isEmpty || text.isEmpty) 0.0
    else {
      val dup = ng.groupBy(identity).collect {
        case (g, occ) if occ.size > 1 => occ.size.toLong * g.length
      }.sum
      math.min(dup.toDouble / text.length, 1.0)
    }
  }

  private def run(texts: Seq[String], n: Int)
      : Seq[(Double, Double, Double, Double)] =
    texts.toDF("text")
      .select(
        TextFunctions.duplicateLineFraction(col("text")).as("a"),
        TextFunctions.duplicateLineCharFraction(col("text")).as("b"),
        TextFunctions.topNgramCharFraction(col("text"), n).as("c"),
        TextFunctions.dupNgramCharFraction(col("text"), n).as("d"))
      .as[(Double, Double, Double, Double)].collect().toSeq

  private def check(texts: Seq[String], n: Int): Unit =
    texts.zip(run(texts, n)).foreach { case (t, (a, b, c, d)) =>
      assert(math.abs(a - refDupLineFrac(t)) < 1e-12, s"dupLine on <$t>")
      assert(math.abs(b - refDupLineCharFrac(t)) < 1e-12,
        s"dupLineChar on <$t>")
      assert(math.abs(c - refTopNgramFrac(t, n)) < 1e-12, s"topNgram on <$t>")
      assert(math.abs(d - refDupNgramFrac(t, n)) < 1e-12, s"dupNgram on <$t>")
    }

  test("edge cases: empty, single line, all-duplicate, boilerplate block") {
    check(Seq(
      "",
      "one single line",
      "a\na\na\na",
      "header\nbody body body\nheader",
      // giant block repeated twice, the case dup-line-CHAR must catch
      (("x" * 50 + "\n") + "unique middle\n" + ("x" * 50)),
      "\n\n \n\t\n", // only blank lines
      "tok" // fewer tokens than n
    ), n = 2)
  }

  test("randomized small-vocabulary texts match the reference") {
    val rnd = new Random(11)
    val vocab = Vector("aa", "bb", "cc", "dd")
    val texts = (1 to 60).map { _ =>
      (1 to (1 + rnd.nextInt(40))).map { _ =>
        vocab(rnd.nextInt(vocab.size)) +
          (if (rnd.nextInt(5) == 0) "\n" else " ")
      }.mkString
    }
    for (n <- Seq(2, 3, 5)) check(texts, n)
  }

  test("native repetition_signals kernel == declarative formulations") {
    val rnd = new Random(23)
    val vocab = Vector("aa", "bb", "cc", "dd", "longtoken")
    val texts = Seq("", "one single line", "a\na\na\na", "\n\n \n\t\n",
      " cc\nbb\n", "tok") ++
      (1 to 40).map { _ =>
        (1 to (1 + rnd.nextInt(50))).map { _ =>
          vocab(rnd.nextInt(vocab.size)) +
            (if (rnd.nextInt(4) == 0) "\n" else " ")
        }.mkString
      }
    import org.apache.spark.sql.functions.call_function
    val rows = texts.toDF("text")
      .select(
        call_function("repetition_signals", col("text")).as("r"),
        TextFunctions.duplicateLineFraction(col("text")).as("dlf"),
        TextFunctions.duplicateLineCharFraction(col("text")).as("dlcf"),
        TextFunctions.topNgramCharFraction(col("text"), 3).as("top3"),
        TextFunctions.dupNgramCharFraction(col("text"), 7).as("dup7"))
      .select(col("r.dlf"), col("dlf"), col("r.dlcf"), col("dlcf"),
        col("r.top3"), col("top3"), col("r.dup7"), col("dup7"))
      .as[(Double, Double, Double, Double, Double, Double, Double, Double)]
      .collect()
    rows.zip(texts).foreach { case ((a1, a2, b1, b2, c1, c2, d1, d2), t) =>
      assert(a1 == a2 && b1 == b2 && c1 == c2 && d1 == d2,
        s"kernel != declarative on <$t>: " +
          s"($a1,$b1,$c1,$d1) vs ($a2,$b2,$c2,$d2)")
    }
  }

  test("repetitionGate agrees with the per-signal thresholds") {
    // the clean text must be LONG: with all-unique n-grams the top-
    // n-gram fraction is len(longest n-gram)/len(text), which trips the
    // 0.20 gate on short strings by construction
    val texts = Seq((1 to 80).map(i => s"word$i").mkString(" "),
      "spam spam spam spam spam spam spam spam")
    val gates = texts.toDF("text")
      .select(TextFunctions.repetitionGate(col("text")).as("g"))
      .as[Boolean].collect().toSeq
    assert(gates == Seq(true, false))
  }
}

/** Mirrors TextFunctions.tokens EXACTLY: Spark's trim() strips SPACES
  * only (not \n or \t), and functions.split uses limit -1, so
  * leading/trailing non-space whitespace yields empty tokens — the
  * reference must reproduce those quirks or it tests the wrong
  * function. */
private object TextRef {
  def sparkTrim(s: String): String =
    s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse

  def tokens(text: String): Seq[String] = {
    val t = sparkTrim(text)
    if (t.isEmpty) Seq.empty else t.split("\\s+", -1).toSeq
  }
}
