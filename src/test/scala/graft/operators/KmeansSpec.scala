package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class KmeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  // two tight groups around (0,0) and (1,1)
  private def vecs = Seq(
    (0L, Seq(0.01f, 0.02f)), (1L, Seq(0.98f, 0.99f)),
    (2L, Seq(0.03f, 0.01f)), (3L, Seq(0.97f, 1.01f)),
    (4L, Seq(0.02f, 0.03f)), (5L, Seq(1.02f, 0.98f))
  ).toDF("id", "v")

  test("quantize is exact, positive, and reversible to 2^-20") {
    val q = vecs.select(Kmeans.quantize(col("v")).as("q"))
      .as[Seq[Long]].collect()
    assert(q.flatten.forall(_ > 0))
    // 0.5f quantizes exactly: round(0.5 * 2^20) = 524288
    val half = Seq((9L, Seq(0.5f))).toDF("id", "v")
      .select(Kmeans.quantize(col("v"))).as[Seq[Long]].head()
    assert(half == Seq(524288L + 2097152L))
  }

  test("fit recovers the two planted clusters") {
    val got = Kmeans.fit(vecs, "id", "v", 2, 2)
      .select("id", "cid").as[(Long, Int)].collect().toMap
    assert(got(0L) == got(2L) && got(2L) == got(4L))
    assert(got(1L) == got(3L) && got(3L) == got(5L))
    assert(got(0L) != got(1L))
  }

  test("fit is bit-deterministic across runs") {
    val a = Kmeans.fit(vecs, "id", "v", 2, 3)
      .select("id", "cid").as[(Long, Int)].collect().toSet
    val b = Kmeans.fit(vecs.repartition(3), "id", "v", 2, 3)
      .select("id", "cid").as[(Long, Int)].collect().toSet
    assert(a == b)
  }

  test("assignment ties break to the lowest cid") {
    val one = Seq((0L, Seq(0.5f))).toDF("id", "v")
      .select(col("id"), Kmeans.quantize(col("v")).as("q"))
    val equidistant = Seq(7 -> Seq(2621440L), 3 -> Seq(2621440L))
    val got = Kmeans.assign(one, "q", equidistant)
      .select("cid").as[Int].head()
    assert(got == 3)
  }

  test("assignment is map-only: no exchange in the plan") {
    val q = vecs.select(col("id"), Kmeans.quantize(col("v")).as("q"))
    val plan = Kmeans.assign(q, "q", Seq(0 -> Seq(2097152L, 2097152L)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("emptied cluster disappears instead of resurrecting") {
    // both points sit at (0,0); far-away init centroid 1 loses all
    val pts = Seq((0L, Seq(0.0f)), (1L, Seq(0.0f))).toDF("id", "v")
    val q = pts.select(col("id"), Kmeans.quantize(col("v")).as("q"))
    val assigned = Kmeans.assign(q, "q",
      Seq(0 -> Seq(2097152L), 1 -> Seq(9999999L)))
    val cs = Kmeans.updateCentroids(assigned, "q")
    assert(cs.map(_._1) == Seq(0))
  }
}
