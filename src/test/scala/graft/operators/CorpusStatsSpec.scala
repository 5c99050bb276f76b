package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  test("boundedQuantiles: exact rank selection when the sample is all rows") {
    // values 1..10, k larger than the frame -> sample = everything and
    // quantile q = value at rank ceil(q*10)
    val docs = (1L to 10L).map(i => (i, i * 100)).toDF("doc_id", "v")
    val got = CorpusStats
      .boundedQuantiles(docs, "doc_id", $"v",
        quantiles = Seq(0.1, 0.5, 0.75, 1.0), k = 100)
      .select($"q", $"value", $"n_sample")
      .as[(Double, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((0.1, 100L, 10L), (0.5, 500L, 10L),
      (0.75, 800L, 10L), (1.0, 1000L, 10L)))
  }

  test("boundedQuantiles: k truncates deterministically by id hash") {
    val docs = (1L to 50L).map(i => (i, i)).toDF("doc_id", "v")
    val a = CorpusStats.boundedQuantiles(docs, "doc_id", $"v", k = 8)
      .select($"n_sample").distinct().as[Long].collect()
    assert(a.toSeq == Seq(8L))
    // deterministic: same 8 rows on re-run
    val run1 = CorpusStats.boundedQuantiles(docs, "doc_id", $"v", k = 8)
      .select($"q", $"value").as[(Double, Long)].collect().toSet
    val run2 = CorpusStats.boundedQuantiles(docs, "doc_id", $"v", k = 8)
      .select($"q", $"value").as[(Double, Long)].collect().toSet
    assert(run1 == run2)
  }

  test("boundedQuantiles plans the sample as a distributed top-k") {
    val docs = spark.read
      .parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val plan = CorpusStats.boundedQuantiles(docs, "doc_id",
      CorpusStats.tokenMeasure($"text"))
      .queryExecution.executedPlan.toString
    // orderBy(hash).limit(k) must be TakeOrderedAndProject (per-partition
    // top-k merged on the driver), NOT a global sort
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("lengthHistogram: exact buckets, bounds and sums") {
    val docs = Seq(3L, 7L, 10L, 19L, 25L).map(v => Tuple1(v)).toDF("v")
    val got = CorpusStats.lengthHistogram(docs, $"v", width = 10)
      .select($"bucket", $"lo", $"n_docs", $"min_v", $"max_v", $"sum_v")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(_._1).toSeq
    assert(got == Seq((0L, 0L, 2L, 3L, 7L, 10L),
      (1L, 10L, 2L, 10L, 19L, 29L), (2L, 20L, 1L, 25L, 25L, 25L)))
  }
}
