package graft.functions.expr

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct-count sketch as a native aggregate.
  *
  * `approx_count_distinct`'s HLL is engine-specific, so its answer can
  * never be oracle-verified across engines. KMV is just as scalable and
  * fully deterministic given a deterministic hash: keep the k smallest
  * md5-based 60-bit hashes of the values; with fewer than k distinct
  * hashes the count is exact, otherwise estimate (k-1) · 2^60 / h_k
  * (Bar-Yossef et al., "Counting distinct elements in a data stream",
  * RANDOM'02; std error ≈ 1/√(k−2)).
  *
  * As a TypedImperativeAggregate it gets map-side partial aggregation:
  * each task reduces its rows to a ≤k-element sorted set (O(k) memory,
  * O(log k) per row), and only those k longs shuffle — per group, the
  * shuffle is k·8 bytes no matter how many billions of rows fed it.
  * That bounded-state merge is exactly what a groupBy + collect_set
  * formulation lacks, and why this is a native aggregate and not a
  * composition.
  *
  * The estimate divides `(k−1) · 2^60` (exact in double for k ≤ 2^8)
  * by the k-th hash in one multiply-then-divide, so a DuckDB oracle
  * replaying `('0x' || substr(md5(v), 1, 15))::BIGINT` reproduces the
  * result bit-for-bit.
  */
case class KmvSketch(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2 && k <= 65536, s"kmv_distinct: k=$k out of range [2, 65536]")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct needs a STRING input (cast first), got ${child.dataType}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = HashExprUtils.hash60(v.asInstanceOf[UTF8String])
      if (buf.size < k) buf.add(h)
      else if (h < buf.last) { if (buf.add(h)) buf.pollLast() }
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (buf.size < k) buf.add(h)
      else if (h < buf.last) { if (buf.add(h)) buf.pollLast() }
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else ((k - 1).toDouble * KmvSketch.Two60) / buf.last.toDouble

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val out = new ByteArrayOutputStream(4 + buf.size * 8)
    val d = new DataOutputStream(out)
    d.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) d.writeLong(it.next())
    d.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): KmvSketch =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KmvSketch =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}

object KmvSketch {
  /** 2^60 — exactly representable; hash60 values are uniform in [0, 2^60). */
  val Two60: Double = 1152921504606846976.0d
}
