package graft.functions.expr

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** [[KmvSketch]]'s SET-VALUED sibling: returns the k smallest 60-bit
  * hashes themselves (sorted ascending) instead of the scalar estimate.
  *
  * The point is SKETCH ALGEBRA (Beyer et al., "On synopses for
  * distinct-value estimation under multiset operations", SIGMOD 2007):
  * a KMV synopsis is mergeable and closed under union — the k smallest
  * of `A ∪ B` are computable from the two k-sets alone — and supports
  * intersection estimation via the Jaccard fraction observed inside the
  * merged synopsis. So per-group sketches built in ONE pass over the
  * data can answer distinct-count queries for any union/intersection of
  * groups WITHOUT rescanning rows — the capability a plain
  * `count(DISTINCT)` fundamentally lacks (its distinct sets don't
  * compose), and the reason this returns the set: downstream algebra is
  * plain array expressions (`array_union`/`array_intersect`/`slice`),
  * scan-local over a groups-sized frame.
  *
  * Same bounded-state posture as [[KmvSketch]]: O(k) memory per group,
  * k·8 bytes per group on the shuffle, deterministic md5-family hash an
  * external SQL oracle replays value for value.
  */
case class KmvSetSketch(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2 && k <= 65536, s"kmv_set: k=$k out of range [2, 65536]")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_set needs a STRING input (cast first), got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_set"

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

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr) // TreeSet iterates ascending: sorted
  }

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

  override def withNewMutableAggBufferOffset(n: Int): KmvSetSketch =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KmvSetSketch =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): KmvSetSketch =
    copy(child = newChild)
}
