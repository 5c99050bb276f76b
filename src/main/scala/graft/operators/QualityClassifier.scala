package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** In-engine training of a linear quality classifier — the
  * fastText-style "train the filter model on the corpus itself" step
  * of an LLM data pipeline, as deterministic full-batch gradient
  * descent on squared loss.
  *
  * Scale shape: one aggregate job per iteration — the per-document
  * gradient contributions reduce through Spark's map-side partial
  * aggregation, so each iteration shuffles d+1 values per partition
  * (not per row) and the driver sees d+1 numbers; the corpus is
  * scanned `iters` times (persist the feature frame upstream if the
  * scan dominates). No collect of data, no driver-side loop over rows.
  *
  * Determinism: a double gradient SUM depends on partition/visit
  * order (the FP-associativity trap flagged on domainRates in round
  * 9). Here every per-document contribution is rounded to
  * DECIMAL(25,12) and summed in EXACT fixed-point arithmetic —
  * associative, so ANY partitioning, engine, or schedule produces the
  * bit-identical gradient, and an external SQL engine replays training
  * exactly. Squared loss keeps the whole chain in +,·
  * (no exp/sigmoid), so there is no transcendental-libm divergence
  * risk between engines; weight updates happen in driver doubles with
  * a fixed evaluation order `w + lr·(g/n)`.
  */
object QualityClassifier {

  private val GradType = DecimalType(25, 12)

  /** Train `iters` full-batch GD steps from w = 0. `features` are the
    * model inputs (include a `lit(1.0)` bias as the first element);
    * `label` must evaluate to 0.0/1.0 doubles.
    *
    * @return the learned weights, one per feature column
    */
  def train(docs: DataFrame, features: Seq[Column], label: Column,
      iters: Int = 3, lr: Double = 0.5): Array[Double] = {
    require(features.nonEmpty, "QualityClassifier: no feature columns")
    require(iters >= 1, s"QualityClassifier: iters=$iters must be >= 1")
    val d = features.size
    val cols = features.zipWithIndex.map { case (f, i) =>
      f.cast("double").as(s"x$i")
    } :+ label.cast("double").as("y")
    val feats = docs.select(cols: _*)
    val n = feats.count()
    require(n > 0, "QualityClassifier: empty training frame")
    var w = Array.fill(d)(0.0)
    for (_ <- 1 to iters) {
      val residual = col("y") - dot(w)
      val grads = feats.agg(
        sum((residual * col("x0")).cast(GradType)).as("g0"),
        (1 until d).map(j =>
          sum((residual * col(s"x$j")).cast(GradType)).as(s"g$j")): _*)
        .head()
      w = w.indices.map { j =>
        // fixed order w + lr·(g/n): the oracle replays it verbatim
        w(j) + lr * (grads.getDecimal(j).doubleValue() / n)
      }.toArray
    }
    w
  }

  /** w·x over the `x0..xd` feature columns, left-to-right — the same
    * association order the SQL replay writes out. */
  private def dot(w: Array[Double]): Column =
    w.zipWithIndex.map { case (wj, j) => lit(wj) * col(s"x$j") }
      .reduceLeft(_ + _)

  /** Score expression for learned weights: `features` must be the SAME
    * column expressions training saw, in the same order. */
  def score(features: Seq[Column], w: Array[Double]): Column = {
    require(features.size == w.length,
      s"feature/weight arity mismatch: ${features.size} vs ${w.length}")
    features.zip(w).map { case (f, wj) => lit(wj) * f.cast("double") }
      .reduceLeft(_ + _)
  }
}
