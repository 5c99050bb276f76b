package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native cosine similarity over two `array<double>` columns.
  *
  * Why a custom Expression instead of composing built-ins: the built-in
  * route (`aggregate(zip_with(...))`, see [[graft.operators.Similarity
  * .cosine]]) allocates a zipped intermediate array per row and evaluates
  * the lambda via interpreted expression evaluation per element — Spark's
  * higher-order functions do not compile the lambda into whole-stage
  * codegen. For brute-force ANN the cosine is THE inner loop (corpus ×
  * queries evaluations), so this expression emits a single fused Java
  * loop over the two `ArrayData` (no allocation, no per-element dispatch)
  * via `doGenCode`, with an identical `nullSafeEval` interpreted path.
  *
  * The accumulation order (sequential dot / norm sums, then
  * `dot / (sqrt(na) * sqrt(nb))`) exactly matches the HOF formulation so
  * both produce bit-identical doubles — the correctness oracle relies on
  * deterministic floating point.
  *
  * Mismatched lengths raise (vector dimensionality is a schema-level
  * invariant; silently truncating would corrupt similarity scores).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // ExpectsInputTypes is private[sql] in Spark 4; enforce manually
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = ArrayType(DoubleType, containsNull = true)
    def accepts(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (accepts(left.dataType) && accepts(right.dataType)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires (${ok.simpleString}, ${ok.simpleString}), " +
          s"got (${left.dataType.simpleString}, " +
          s"${right.dataType.simpleString})")
    }
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) {
      throw new IllegalArgumentException(
        s"cosine_sim: dimension mismatch ${n} vs ${y.numElements()}")
    }
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "cosine_sim: dimension mismatch " + $n + " vs " +
         |    $b.numElements());
         |}
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xi = $a.getDouble($i);
         |  final double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) *
         |  java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
