package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog distinct-count sketch as a native aggregate — the
  * register-array companion to [[KmvSketch]] (Flajolet et al., "HyperLogLog:
  * the analysis of a near-optimal cardinality estimation algorithm",
  * AofA'07).
  *
  * Spark's `approx_count_distinct` is already HLL, but its hash
  * (xxHash64 of the internal binary layout) and its bias-correction
  * tables are engine-private: no external SQL engine can replay the
  * answer, so it can never pass this repo's oracle gate. This variant is
  * built for engine-portable determinism end to end:
  *
  *   - hash60 (first 15 hex chars of md5) — the repo-wide hash family a
  *     DuckDB oracle reproduces as `('0x' || substr(md5(v),1,15))::BIGINT`;
  *   - register index = `h % m`, remaining value `w = h / m`
  *     (both exact integer ops);
  *   - rank ρ(w) = (60−p) − bitlength(w) + 1, with bitlength replayable
  *     as `length(bin(w))` — no floating log2 anywhere;
  *   - the evaluation emits EXACT INTEGERS, not the estimate: the
  *     indicator sum Σⱼ2^(−Mⱼ) is returned scaled by 2^R (R = 60−p+1,
  *     the max possible rank) as the long `t = Σⱼ 2^(R−Mⱼ)` — every
  *     term a power of two, the sum exact — plus the empty-register
  *     count. The raw HLL estimate αₘ·m²·2^R / t is one literal
  *     multiply chain and one IEEE division away, which the CALLER
  *     applies as a Column expression so both engines run the same
  *     correctly-rounded double ops in the same order. No ln/log2 means
  *     no transcendental drift; the small-range linear-counting
  *     correction (which needs ln) is deliberately left to the caller,
  *     who has `zeros` to compute it.
  *
  * Scale shape: the buffer is m bytes (64 for p=6) regardless of input
  * volume; update is one md5 + O(1); merge is an elementwise byte max —
  * commutative and idempotent, so map-side partial aggregation bounds
  * the per-group shuffle at m bytes no matter how many billions of rows
  * fed it, and the result is bit-identical under any partitioning.
  *
  * The reference engine has no sketch surface (it is a row replicator —
  * river/sync.go); this is LLM-pipeline extension surface, the
  * distinct-count analog of [[Cms]]'s frequency estimates.
  */
case class HllSketch(child: Expression, p: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  require(p >= 4 && p <= 12, s"hll_sketch: p=$p out of range [4, 12]")

  private val m: Int = 1 << p
  /** Max rank: w has 60−p bits, so ρ ∈ [1, 60−p+1] (ρ of w=0 is 60−p+1). */
  private val maxRank: Int = 60 - p + 1

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_sketch needs a STRING input (cast first), got ${child.dataType}")

  override def dataType: DataType = StructType(Seq(
    StructField("t", LongType, nullable = false),
    StructField("zeros", IntegerType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "hll_sketch"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(regs: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = HashExprUtils.hash60(v.asInstanceOf[UTF8String])
      val j = (h % m).toInt
      val w = h / m
      // bitlength(w) = 64 - nlz(w); ρ = (60-p) - bitlength(w) + 1
      val rho =
        if (w == 0L) maxRank
        else 60 - p - (64 - java.lang.Long.numberOfLeadingZeros(w)) + 1
      if (rho > regs(j)) regs(j) = rho.toByte
    }
    regs
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < m) { if (b(j) > a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def eval(regs: Array[Byte]): Any = {
    var t = 0L
    var zeros = 0
    var j = 0
    while (j < m) {
      t += 1L << (maxRank - regs(j))
      if (regs(j) == 0) zeros += 1
      j += 1
    }
    new GenericInternalRow(Array[Any](t, zeros))
  }

  override def serialize(regs: Array[Byte]): Array[Byte] = regs
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(n: Int): HllSketch =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllSketch =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): HllSketch =
    copy(child = newChild)
}

object HllSketch {
  /** αₘ·m²·2^R as an exact-literal double product for the caller's
    * estimate `alphaM2R(p) / t` — both factors of the IEEE chain are
    * spelled out so an external oracle can repeat them term for term:
    * (α * m²) * 2^R, α the standard HLL constant (0.673 for m=16,
    * 0.697 for 32, 0.709 for 64, 0.7213/(1+1.079/m) above). */
  def alpha(p: Int): Double = (1 << p) match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case m => 0.7213 / (1.0 + 1.079 / m)
  }
}
