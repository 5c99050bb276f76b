package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused kernel for the Gopher repetition signals: one line pass plus
  * ONE token scan fills all nine n-gram count tables (n = 2..10) —
  * grams grow incrementally per start position, so shared prefixes are
  * built once, not once per n — yielding all eleven signals
  * (duplicate-line fraction, duplicate-line CHAR fraction,
  * top-2/3/4-gram char fractions, duplicated-5..10-gram char
  * fractions) that the declarative formulations in
  * [[graft.functions.TextFunctions]] each derive from their own
  * interpreted higher-order tree. The single-scan shape measured 1.6×
  * over per-n rebuild scans (hash-merge cost dominates; the nine count
  * tables are live simultaneously, bounded by the doc's own n-gram
  * footprint). Declarative semantics are
  * reproduced EXACTLY (TextRepetitionSpec pins kernel == declarative):
  *   - lines: split on '\n' (limit -1), Spark trim (SPACES only),
  *     drop empties;
  *   - tokens: Spark trim, then whitespace split with limit -1 —
  *     leading/trailing non-space whitespace yields empty tokens;
  *   - n-grams: concat_ws(" ") of n consecutive tokens (empty tokens
  *     keep their separators);
  *   - lengths are CHARACTER counts (code points), matching Spark's
  *     `length`;
  *   - top fraction = max over distinct g of count·len(g) / len(text),
  *     capped at 1; dup fraction sums count·len(g) where count > 1.
  */
object RepetitionUtils {

  val schema: StructType = StructType(
    Seq(StructField("dlf", DoubleType, nullable = false),
      StructField("dlcf", DoubleType, nullable = false)) ++
      Seq(2, 3, 4).map(n =>
        StructField(s"top$n", DoubleType, nullable = false)) ++
      (5 to 10).map(n =>
        StructField(s"dup$n", DoubleType, nullable = false)))

  /** Spark's trim(): strips SPACE characters only. */
  private def sparkTrim(s: String): String = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    if (b == 0 && e == s.length) s else s.substring(b, e)
  }

  /** Character (code point) count, matching Spark's `length`. */
  private def numChars(s: String): Int = s.codePointCount(0, s.length)

  def signals(textU: UTF8String): InternalRow = {
    val text = textU.toString

    // ---- line signals
    val lines = text.split("\n", -1).iterator
      .map(sparkTrim).filter(_.nonEmpty).toArray
    var dlf = 0.0
    var dlcf = 0.0
    if (lines.nonEmpty) {
      val counts = new java.util.HashMap[String, Int]()
      var total = 0L
      lines.foreach { l =>
        total += numChars(l)
        counts.merge(l, 1, Integer.sum)
      }
      dlf = (lines.length - counts.size).toDouble / lines.length
      if (total > 0) {
        var dup = 0L
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue > 1) dup += e.getValue.toLong * numChars(e.getKey)
        }
        dlcf = dup.toDouble / total
      }
    }

    // ---- n-gram signals
    val trimmed = sparkTrim(text)
    val toks: Array[String] =
      if (trimmed.isEmpty) Array.empty[String]
      else trimmed.split("\\s+", -1)
    val textLen = numChars(text)

    // All nine n-gram maps (n = 2..10) from ONE token scan: at each
    // start position the gram grows by one token at a time in a single
    // StringBuilder, snapshotting into map n whenever length n is
    // reached — shared prefixes are appended once, not once per n
    // (the 9-passes-rebuilding-prefixes shape this replaces appended
    // ~Σn = 54 tokens per position; this appends ≤ 10). Distinct-gram
    // strings and counts are identical, so every signal is
    // bit-identical (TextRepetitionSpec pins kernel == declarative).
    val maxN = 10
    val maps = new Array[java.util.HashMap[String, Int]](maxN + 1)
    if (textLen > 0) {
      var n = 2
      while (n <= maxN) {
        if (toks.length >= n) maps(n) = new java.util.HashMap[String, Int]()
        n += 1
      }
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < toks.length) {
        sb.setLength(0)
        sb.append(toks(i))
        val lim = math.min(maxN, toks.length - i)
        var j = 1
        while (j < lim) {
          sb.append(' ')
          sb.append(toks(i + j))
          j += 1
          if (j >= 2) maps(j).merge(sb.toString, 1, Integer.sum)
        }
        i += 1
      }
    }

    // (top fraction, dup fraction) for one n from its gram counts
    def ngramStats(n: Int): (Double, Double) = {
      val counts = maps(n)
      if (counts == null) (0.0, 0.0)
      else {
        var best = 0L
        var dup = 0L
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val contrib = e.getValue.toLong * numChars(e.getKey)
          if (contrib > best) best = contrib
          if (e.getValue > 1) dup += contrib
        }
        (math.min(best.toDouble / textLen, 1.0),
          math.min(dup.toDouble / textLen, 1.0))
      }
    }

    val out = new Array[Any](11)
    out(0) = dlf
    out(1) = dlcf
    var idx = 2
    Seq(2, 3, 4).foreach { n => out(idx) = ngramStats(n)._1; idx += 1 }
    (5 to 10).foreach { n => out(idx) = ngramStats(n)._2; idx += 1 }
    InternalRow.fromSeq(out.toIndexedSeq)
  }
}

/** `repetition_signals(string) -> struct<dlf,dlcf,top2..4,dup5..10>` —
  * see [[RepetitionUtils.signals]]. */
case class RepetitionSignals(child: Expression) extends UnaryExpression {
  override def dataType: DataType = RepetitionUtils.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"repetition_signals requires string, got ${t.simpleString}")
  }

  override def nullSafeEval(text: Any): Any =
    RepetitionUtils.signals(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expr.RepetitionUtils.signals($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
