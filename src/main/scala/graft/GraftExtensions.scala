package graft

import graft.functions.expr.{ByteHistogram, ConnectDecimal, CosineSimilarity, HashedShingles, HllSketch, KmvSetSketch, KmvSketch, MinHashSig, RepetitionSignals, SimHash60, SortedIntersectCount, TopKPairs}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension entry point: registers graft's native expressions.
  *
  * Use either declaratively
  * (`.config("spark.sql.extensions", "graft.GraftExtensions")`) or
  * imperatively on a live session ([[GraftExtensions.register]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach(ext.injectFunction)
}

object GraftExtensions {
  private type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def fn(name: String, clazz: Class[_], arity: Int)(
      build: Seq[Expression] => Expression): FunctionDescription = (
    FunctionIdentifier(name),
    new ExpressionInfo(clazz.getName, name),
    (children: Seq[Expression]) => {
      require(children.size == arity,
        s"$name takes $arity arguments, got ${children.size}")
      build(children)
    })

  private val all: Seq[FunctionDescription] = Seq(
    fn("cosine_sim", classOf[CosineSimilarity], 2)(c =>
      CosineSimilarity(c.head, c(1))),
    fn("simhash60", classOf[SimHash60], 1)(c => SimHash60(c.head)),
    fn("sorted_intersect_count", classOf[SortedIntersectCount], 2)(c =>
      SortedIntersectCount(c.head, c(1))),
    // k via int literal, e.g. minhash_sig(hashes, 16)
    fn("minhash_sig", classOf[MinHashSig], 2)(c =>
      MinHashSig(c.head, c(1).eval().asInstanceOf[Int])),
    fn("hashed_shingles", classOf[HashedShingles], 2)(c =>
      HashedShingles(c.head, c(1).eval().asInstanceOf[Int])),
    // bins via int literal, e.g. byte_hist(payload, 16)
    fn("byte_hist", classOf[ByteHistogram], 2)(c =>
      ByteHistogram(c.head, c(1).eval().asInstanceOf[Int])),
    // aggregate; k via int literal, e.g. kmv_distinct(v, 64)
    fn("kmv_distinct", classOf[KmvSketch], 2)(c =>
      KmvSketch(c.head, c(1).eval().asInstanceOf[Int])),
    // aggregate; register-count exponent p via int literal,
    // e.g. hll_sketch(v, 6) -> struct(t, zeros)
    fn("hll_sketch", classOf[HllSketch], 2)(c =>
      HllSketch(c.head, c(1).eval().asInstanceOf[Int])),
    // aggregate; k via int literal, e.g. kmv_set(v, 64) -> array<long>
    fn("kmv_set", classOf[KmvSetSketch], 2)(c =>
      KmvSetSketch(c.head, c(1).eval().asInstanceOf[Int])),
    fn("repetition_signals", classOf[RepetitionSignals], 1)(c =>
      RepetitionSignals(c.head)),
    // scale via int literal, e.g. connect_decimal(unbase64(v), 2)
    fn("connect_decimal", classOf[ConnectDecimal], 2)(c =>
      ConnectDecimal(c.head, c(1).eval().asInstanceOf[Int])),
    // aggregate; k via int literal, e.g. topk_pairs(cents, id, 5).
    // Set semantics: EXACT duplicate (ord, id) input rows collapse to
    // one buffer entry, so groups whose ids are not unique can return
    // fewer than k rows and differ from the row_number window form —
    // feed a unique id per row (the documented contract).
    fn("topk_pairs", classOf[TopKPairs], 3)(c =>
      TopKPairs(c.head, c(1), c(2).eval().asInstanceOf[Int])))

  /** Register the functions on an already-built session. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    all.foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
  }
}
