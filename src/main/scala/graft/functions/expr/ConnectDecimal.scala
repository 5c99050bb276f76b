package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Static kernel for [[ConnectDecimal]] — shared by interpreted eval and
  * generated code. */
object ConnectDecimalUtils {
  /** Kafka Connect `Decimal` wire bytes → Spark Decimal: the bytes are
    * the two's-complement big-endian UNSCALED value (exactly
    * `java.math.BigInteger(byte[])`), the scale travels in the connect
    * schema — Debezium's `decimal.handling.mode=precise` encoding for
    * DECIMAL/NUMERIC and unsigned BIGINT columns. */
  def decode(bytes: Array[Byte], scale: Int): Decimal =
    if (bytes.length == 0) Decimal(java.math.BigDecimal.valueOf(0L, scale))
    else Decimal(new java.math.BigDecimal(
      new java.math.BigInteger(bytes), scale))
}

/** `connect_decimal(binary, scale) -> decimal(38, scale)` — decode a
  * Kafka Connect precise-mode decimal payload. `scale` must be a
  * literal (it fixes the result type at plan time, like the connect
  * schema fixes it per column). Reference behavior being matched: the
  * reference reads the same columns through the binlog library's
  * already-decoded values (river/sync.go:242-315); a Debezium feed
  * delivers them still wire-encoded, so the engine decodes in-plan. */
case class ConnectDecimal(child: Expression, scale: Int)
    extends UnaryExpression {
  override def dataType: DataType = DecimalType(38, scale)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType if scale >= 0 && scale <= 37 =>
      TypeCheckResult.TypeCheckSuccess
    case BinaryType => TypeCheckResult.TypeCheckFailure(
      s"connect_decimal scale $scale out of range [0, 37]")
    case t => TypeCheckResult.TypeCheckFailure(
      s"connect_decimal requires binary, got ${t.simpleString}")
  }

  override def nullSafeEval(bytes: Any): Any =
    ConnectDecimalUtils.decode(bytes.asInstanceOf[Array[Byte]], scale)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expr.ConnectDecimalUtils.decode($c, $scale)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
