package graft.functions.expr

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Grouped top-k as a native bounded-state aggregate — the 100 TB
  * answer to `row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k`:
  * the window formulation SORTS every group's full row set (the whole
  * table moves through a per-group sort just to keep k rows); this
  * aggregate keeps a k-element heap per group, so each task reduces its
  * slice to ≤ k (ord, id) pairs and ONLY those shuffle — per group the
  * exchange carries k·16 bytes no matter how many billions of rows fed
  * it, and the executed plan contains no WindowExec at all
  * (spec-asserted, same bar as GlobalRank.groupedNtile).
  *
  * Ordering is the (ord, id) TOTAL order — ties at equal `ord` resolve
  * by the unique id, so the kept set and its emitted DESC order are
  * deterministic and a DuckDB `row_number ... ORDER BY ord DESC, id
  * DESC` replay matches row-for-row. Both inputs are LONGs (normalize
  * floats to integer units first — same rule as every exact path here).
  *
  * The buffer is a SET over (ord, id): exact duplicate input pairs
  * collapse to one entry, so if ids are NOT unique per group the
  * result can hold fewer than k rows and diverge from the window
  * formulation (which keeps both copies). Unique-id-per-row is the
  * contract — it is what makes the order total and the result
  * deterministic in the first place; callers with non-unique ids must
  * disambiguate (e.g. monotonically_increasing_id) before aggregating.
  */
case class TopKPairs(ord: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[TopKPairs.P]]
  with BinaryLike[Expression] {

  require(k >= 1 && k <= 65536, s"topk_pairs: k=$k out of range [1, 65536]")

  override def left: Expression = ord
  override def right: Expression = id

  override def checkInputDataTypes(): TypeCheckResult =
    if (ord.dataType == LongType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_pairs needs (BIGINT, BIGINT), got " +
        s"(${ord.dataType}, ${id.dataType})")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("ord", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_pairs"

  override def createAggregationBuffer(): java.util.TreeSet[TopKPairs.P] =
    new java.util.TreeSet[TopKPairs.P]()

  private def offer(buf: java.util.TreeSet[TopKPairs.P],
      p: TopKPairs.P): Unit = {
    if (buf.size < k) { buf.add(p); () }
    else if (p.compareTo(buf.first) > 0) {
      if (buf.add(p)) { buf.pollFirst(); () }
    }
  }

  override def update(buf: java.util.TreeSet[TopKPairs.P],
      input: InternalRow): java.util.TreeSet[TopKPairs.P] = {
    val o = ord.eval(input)
    val i = id.eval(input)
    if (o != null && i != null)
      offer(buf, TopKPairs.P(o.asInstanceOf[Long], i.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: java.util.TreeSet[TopKPairs.P],
      other: java.util.TreeSet[TopKPairs.P])
      : java.util.TreeSet[TopKPairs.P] = {
    val it = other.iterator()
    while (it.hasNext) offer(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[TopKPairs.P]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.descendingIterator()
    var i = 0
    while (it.hasNext) {
      val p = it.next()
      out(i) = new GenericInternalRow(Array[Any](p.ord, p.id))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[TopKPairs.P]): Array[Byte] = {
    val out = new ByteArrayOutputStream(4 + buf.size * 16)
    val d = new DataOutputStream(out)
    d.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val p = it.next()
      d.writeLong(p.ord); d.writeLong(p.id)
    }
    d.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.TreeSet[TopKPairs.P] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[TopKPairs.P]()
    var i = 0
    while (i < n) { buf.add(TopKPairs.P(bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): TopKPairs =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKPairs =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TopKPairs =
    copy(ord = newLeft, id = newRight)
}

object TopKPairs {
  /** (ord, id) under the natural total order — id breaks ties, so two
    * distinct rows never compare equal and the kept set is unique. */
  final case class P(ord: Long, id: Long) extends Comparable[P] {
    override def compareTo(o: P): Int = {
      val c = java.lang.Long.compare(ord, o.ord)
      if (c != 0) c else java.lang.Long.compare(id, o.id)
    }
  }
}
