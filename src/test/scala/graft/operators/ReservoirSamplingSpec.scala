package graft.operators

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Stratified sampling + exact per-stratum reservoir: the two-level
  * top-k must be row-identical to the naive one-window-per-stratum
  * rank (the skew-prone formulation it replaces), and the stratified
  * Bernoulli-by-hash pass must hit per-stratum rates deterministically. */
class ReservoirSamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  // skewed strata: one stratum holds ~80% of rows — exactly the shape
  // the two-level reservoir exists for
  private lazy val rows = {
    val rnd = new Random(5)
    (1L to 5000L).map { id =>
      val stratum =
        if (rnd.nextInt(10) < 8) "web"
        else Seq("books", "code", "wiki")(rnd.nextInt(3))
      (id, stratum)
    }
  }
  private lazy val df = rows.toDF("doc_id", "source")

  test("reservoirByHash == naive per-stratum rank window, row for row") {
    val naive = df
      .withColumn("sample_rank", row_number().over(
        Window.partitionBy($"source")
          .orderBy(md5($"doc_id".cast("string")).asc, $"doc_id".asc)))
      .filter($"sample_rank" <= 17)
    for (subParts <- Seq(1, 4, 32)) {
      val got = Sampling.reservoirByHash(df, "doc_id", "source",
        k = 17, subParts = subParts)
      assert(got.exceptAll(naive).count() == 0 &&
        naive.exceptAll(got).count() == 0,
        s"two-level reservoir diverged from naive at subParts=$subParts")
    }
  }

  test("reservoir yields exactly k per stratum (or the whole stratum)") {
    val got = Sampling.reservoirByHash(df, "doc_id", "source", k = 17)
      .groupBy("source").agg(count(lit(1)).as("n"),
        max("sample_rank").as("maxr"))
      .as[(String, Long, Int)].collect()
      .map { case (s, n, r) => s -> ((n, r)) }.toMap
    val sizes = rows.groupBy(_._2).view.mapValues(_.size).toMap
    sizes.foreach { case (s, sz) =>
      val expect = math.min(17, sz)
      assert(got(s.toString) == ((expect.toLong, expect)),
        s"stratum $s: got ${got(s)}, want $expect")
    }
  }

  test("stratifiedSampleByHash: per-stratum rates, default for the rest") {
    val kept = Sampling.stratifiedSampleByHash(df, "doc_id", "source",
      Seq("web" -> 0.25, "books" -> 1.0), defaultFraction = 0.0)
    val by = kept.groupBy("source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val sizes = rows.groupBy(_._2).view.mapValues(_.size).toMap
    // books all kept, unlisted strata dropped, web within hash noise
    assert(by("books") == sizes("books"))
    assert(!by.contains("code") && !by.contains("wiki"))
    val webRate = by("web").toDouble / sizes("web")
    assert(math.abs(webRate - 0.25) < 0.03, s"web rate $webRate")
    // deterministic: the same call selects the same rows
    val again = Sampling.stratifiedSampleByHash(df, "doc_id", "source",
      Seq("web" -> 0.25, "books" -> 1.0), defaultFraction = 0.0)
    assert(kept.exceptAll(again).count() == 0)
  }
}
