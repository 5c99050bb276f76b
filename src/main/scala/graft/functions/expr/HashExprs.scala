package graft.functions.expr

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels shared by the interpreted `eval` and generated code —
  * `doGenCode` emits one static call per row, so the loop body never goes
  * through per-element interpreted expression dispatch. */
object HashExprUtils {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** First 15 hex chars of md5(s) as a long — exactly
    * `conv(substring(md5(s), 1, 15), 16, 10)` (TextFunctions.hash60), so
    * SQL oracles reproduce it. 15 hex chars = top 60 bits of the digest =
    * first 8 bytes big-endian shifted right 4. */
  def hash60(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val top =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    top >>> 4
  }

  /** 60-bit frequency-weighted SimHash over a token array: every token
    * occurrence votes ±1 per bit of its hash60; signature bit j is set
    * iff the vote sum is positive. One pass, no per-bit re-iteration. */
  def simhash60(tokens: ArrayData): Long = {
    val votes = new Array[Int](60)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val h = hash60(tokens.getUTF8String(i))
      var j = 0
      while (j < 60) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 60) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** Intersection size of two SORTED long arrays by linear merge — no
    * per-row hash-set allocation (vs `array_intersect`). Inputs must be
    * sorted ascending and duplicate-free (array_sort over distinct
    * hashes), which the shingle pipeline guarantees. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Sorted distinct hash60 values of the space-joined n-gram shingles of
    * a token array — the whole
    * `array_sort(transform(array_distinct(shingles), hash60))` chain in
    * one pass (hashing before dedup is equivalent: distinct hashes ==
    * hashes of distinct shingles). */
  def hashedShingles(tokens: ArrayData, n: Int): ArrayData = {
    val cnt = tokens.numElements() - n + 1
    if (cnt <= 0) {
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Long])
    }
    val hashes = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
      hashes(i) = hash60(
        UTF8String.concatWs(UTF8String.fromString(" "), parts: _*))
      i += 1
    }
    java.util.Arrays.sort(hashes)
    var w = 1
    i = 1
    while (i < cnt) {
      if (hashes(i) != hashes(i - 1)) { hashes(w) = hashes(i); w += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(hashes, w))
  }

  /** MinHash signature: k minima over the LCG-derived hash family
    * h_i(x) = (A_i * (x mod M) + B_i) mod M applied to each base hash.
    * One pass over the base hashes for all k rows of the signature.
    * A_i/B_i are plain integer arithmetic so SQL oracles reproduce them:
    * A_i = (1103515245*(i+1) + 12345) mod M, B_i = (69069*(i+1) + 1)
    * mod M, M = 2147483647. */
  val MinhashM = 2147483647L
  def lcgA(i: Int): Long = (1103515245L * (i + 1) + 12345L) % MinhashM
  def lcgB(i: Int): Long = (69069L * (i + 1) + 1L) % MinhashM

  def minhashSig(baseHashes: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val as = Array.tabulate(k)(lcgA)
    val bs = Array.tabulate(k)(lcgB)
    val n = baseHashes.numElements()
    var i = 0
    while (i < n) {
      val base = baseHashes.getLong(i) % MinhashM
      var j = 0
      while (j < k) {
        val h = (as(j) * base + bs(j)) % MinhashM
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }
}

/** `simhash60(array<string>) -> long` — see [[HashExprUtils.simhash60]].
  * Custom because the declarative formulation needs 60 interpreted
  * aggregate folds per row ([[graft.operators.Dedup.simhashDeclarative]]);
  * this is one fused pass. */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash60 requires array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(tokens: Any): Any =
    HashExprUtils.simhash60(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expr.HashExprUtils.simhash60($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** `sorted_intersect_count(array<long>, array<long>) -> int` — see
  * [[HashExprUtils.sortedIntersectCount]]. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "sorted_intersect_count requires (array<bigint>, array<bigint>), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    HashExprUtils.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expr.HashExprUtils.sortedIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `hashed_shingles(array<string>, n) -> array<long>` — see
  * [[HashExprUtils.hashedShingles]]. n must be a foldable int literal. */
case class HashedShingles(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hashed_shingles requires array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(tokens: Any): Any =
    HashExprUtils.hashedShingles(tokens.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expr.HashExprUtils.hashedShingles($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** `minhash_sig(array<long>, k) -> array<long>` — see
  * [[HashExprUtils.minhashSig]]. k must be a foldable int literal. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<bigint>, got ${t.simpleString}")
  }

  override def nullSafeEval(hashes: Any): Any =
    HashExprUtils.minhashSig(hashes.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expr.HashExprUtils.minhashSig($c, $k)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
