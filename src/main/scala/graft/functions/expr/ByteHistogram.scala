package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** `byte_hist(binary, bins) -> array<long>` — per-row byte-value
  * histogram over a binary payload, the feature-extraction primitive of
  * the multimodal pipeline (stands where an image embedding / audio
  * spectrogram extractor runs).
  *
  * Custom because Spark has no element access over `binary` at all — the
  * built-in route is a full RDD `mapPartitions` drop (the previous
  * implementation), which exits Tungsten, deserializes every row, and
  * breaks whole-stage codegen for pure per-row arithmetic. This
  * expression keeps the scan → histogram → project pipeline in one
  * generated loop, like the text kernels.
  *
  * `bins` must be a foldable int literal dividing 256; bucket of byte b
  * is `(b & 0xff) / (256 / bins)` — identical to the RDD formulation it
  * replaces, so existing oracles reproduce it.
  */
case class ByteHistogram(child: Expression, bins: Int)
    extends UnaryExpression {
  require(bins > 0 && 256 % bins == 0,
    s"byte_hist: bins=$bins must divide 256")

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def prettyName: String = "byte_hist"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"byte_hist requires binary, got ${t.simpleString}")
  }

  override def nullSafeEval(payload: Any): Any =
    ByteHistogram.compute(payload.asInstanceOf[Array[Byte]], bins)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expr.ByteHistogram.compute($c, $bins)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object ByteHistogram {
  /** Static kernel shared by interpreted eval and generated code. */
  def compute(bytes: Array[Byte], bins: Int): ArrayData = {
    val hist = new Array[Long](bins)
    val width = 256 / bins
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) / width) += 1
      i += 1
    }
    new GenericArrayData(hist)
  }
}
