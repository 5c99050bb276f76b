package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "hello world"),
    (1L, "x" * 700), // payload longer than the 640 width modulus
    (2L, "")
  ).toDF("doc_id", "text")

  test("attachPayload produces binary; decodeMeta appends typed metadata") {
    val decoded = Multimodal.decodeMeta(Multimodal.attachPayload(docs))
    assert(decoded.columns.toSeq ==
      Seq("doc_id", "text", "mime", "width", "height", "n_frames", "n_bytes"))
    val byId = decoded.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(0L).getAs[Long]("n_bytes") == 11L)
    assert(byId(0L).getAs[Int]("width") == 12)
    assert(byId(1L).getAs[Int]("width") == 700 % 640 + 1)
    assert(byId(2L).getAs[Int]("n_frames") == 1) // 0 % 16 + 1
  }

  test("decode runs in batches smaller than a partition") {
    val many = spark.range(200).selectExpr("id as doc_id",
      "repeat('a', cast(id as int)) as text").coalesce(1)
    val decoded = Multimodal.decodeMeta(Multimodal.attachPayload(many),
      batchSize = 16)
    assert(decoded.count() == 200)
    // n_bytes must equal each row's own length, proving batch alignment
    assert(decoded.filter("n_bytes <> doc_id").count() == 0)
  }

  test("featureHistogram: native byte_hist matches a driver-side count") {
    val got = Multimodal.featureHistogram(Multimodal.attachPayload(docs))
      .select($"doc_id", $"byte_hist").as[(Long, Seq[Long])]
      .collect().toMap
    def expected(text: String): Seq[Long] = {
      val hist = new Array[Long](16)
      text.getBytes("UTF-8").foreach(b => hist((b & 0xff) / 16) += 1)
      hist.toSeq
    }
    assert(got(0L) == expected("hello world"))
    assert(got(1L) == expected("x" * 700))
    assert(got(2L) == expected("")) // empty payload -> all-zero bins
    assert(got(2L).sum == 0 && got(2L).length == 16)
  }

  test("featureHistogram stays declarative (no RDD drop in the plan)") {
    val plan = Multimodal.featureHistogram(Multimodal.attachPayload(docs))
      .queryExecution.executedPlan.toString
    // pure per-row arithmetic must not exit Tungsten: the old RDD
    // mapPartitions formulation showed up as a Scan ExistingRDD
    assert(!plan.contains("ExistingRDD"), plan)
    assert(plan.contains("byte_hist"), plan)
  }

  test("byte_hist rejects non-binary input and non-divisor bins") {
    intercept[Exception] {
      docs.selectExpr("byte_hist(text, 16)").collect()
    }
    intercept[Exception] {
      Multimodal.featureHistogram(
        Multimodal.attachPayload(docs), bins = 7).collect()
    }
  }

  test("sampleFrames emits every step-th frame index") {
    val decoded = Multimodal.decodeMeta(Multimodal.attachPayload(
      Seq((7L, "y" * 9)).toDF("doc_id", "text"))) // n_frames = 9%16+1 = 10
    val frames = Multimodal.sampleFrames(decoded, step = 4)
      .as[(Long, Int)].collect().toSeq.sorted
    assert(frames == Seq((7L, 0), (7L, 4), (7L, 8)))
  }
}
