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

  test("sampleFrames emits every step-th frame index") {
    val decoded = Multimodal.decodeMeta(Multimodal.attachPayload(
      Seq((7L, "y" * 9)).toDF("doc_id", "text"))) // n_frames = 9%16+1 = 10
    val frames = Multimodal.sampleFrames(decoded, step = 4)
      .as[(Long, Int)].collect().toSeq.sorted
    assert(frames == Seq((7L, 0), (7L, 4), (7L, 8)))
  }
}
