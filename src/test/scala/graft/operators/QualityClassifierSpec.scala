package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  // y is a noisy threshold of x: linearly separable enough that GD
  // must learn a positive slope
  private lazy val toy = (0 until 400).map { i =>
    val x = (i % 100) / 100.0
    (i.toLong, x, if (x >= 0.5) 1.0 else 0.0)
  }.toDF("id", "x", "y")

  test("training is BIT-identical across partitionings") {
    val fcols = Seq(lit(1.0), col("x"))
    val w1 = QualityClassifier.train(toy.repartition(1), fcols,
      col("y"), iters = 4, lr = 0.5)
    val w13 = QualityClassifier.train(toy.repartition(13), fcols,
      col("y"), iters = 4, lr = 0.5)
    val wRange = QualityClassifier.train(
      toy.repartitionByRange(5, col("x").desc), fcols,
      col("y"), iters = 4, lr = 0.5)
    // exact fixed-point gradient accumulation: not approximately equal
    // — the SAME doubles, whatever the partitioning
    assert(w1.toSeq == w13.toSeq)
    assert(w1.toSeq == wRange.toSeq)
  }

  test("GD learns the direction: higher x scores higher, loss falls") {
    val fcols = Seq(lit(1.0), col("x"))
    val w = QualityClassifier.train(toy, fcols, col("y"),
      iters = 6, lr = 0.5)
    assert(w(1) > 0.0, s"slope ${w(1)} should be positive")
    def mse(weights: Array[Double]): Double =
      toy.select(
        pow(col("y") - QualityClassifier.score(fcols, weights), 2)
          .as("se"))
        .agg(avg("se")).head().getDouble(0)
    assert(mse(w) < mse(Array(0.0, 0.0)),
      "training did not reduce squared loss from the zero model")
    // scores must rank by x (a linear model with positive slope)
    val scored = toy
      .select(col("x"),
        QualityClassifier.score(fcols, w).as("s"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(scored.sortBy(_._1).map(_._2).sliding(2)
      .forall(p => p.length < 2 || p(0) <= p(1)))
  }

  test("train rejects empty features, bad iters, empty frame") {
    intercept[IllegalArgumentException] {
      QualityClassifier.train(toy, Seq.empty, col("y"))
    }
    intercept[IllegalArgumentException] {
      QualityClassifier.train(toy, Seq(col("x")), col("y"), iters = 0)
    }
    intercept[IllegalArgumentException] {
      QualityClassifier.train(toy.filter(col("id") < 0),
        Seq(col("x")), col("y"))
    }
    intercept[IllegalArgumentException] {
      QualityClassifier.score(Seq(col("x")), Array(1.0, 2.0))
    }
  }
}
