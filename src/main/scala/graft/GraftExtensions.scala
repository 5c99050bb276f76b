package graft

import graft.functions.expr.CosineSimilarity
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
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineSim)
  }
}

object GraftExtensions {
  private type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private val cosineSim: FunctionDescription = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        s"cosine_sim takes 2 arguments, got ${children.size}")
      CosineSimilarity(children.head, children(1))
    })

  /** Register the functions on an already-built session. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.registerFunction(cosineSim._1, cosineSim._2, cosineSim._3)
  }
}
