package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "hello world"), // doc 0: GIF (0 % 4 == 0), 2+11%8 = 5 frames
    (1L, "x" * 700),     // doc 1: PNG longer than the 96 width modulus
    (2L, "")             // doc 2: PNG, empty text -> 1x1
  ).toDF("doc_id", "text")

  test("decodeMeta reports real javax.imageio geometry and frame counts") {
    val decoded = Multimodal.decodeMeta(Multimodal.attachImagePayload(docs))
    assert(decoded.columns.toSeq ==
      Seq("doc_id", "text", "mime", "width", "height", "n_frames", "n_bytes"))
    val byId = decoded.collect().map(r => r.getLong(0) -> r).toMap
    // doc 0: animated GIF, 11 % 8 + 2 = 5 frames, 12x12
    assert(byId(0L).getAs[String]("mime") == "image/gif")
    assert(byId(0L).getAs[Int]("width") == 12)
    assert(byId(0L).getAs[Int]("height") == 12)
    assert(byId(0L).getAs[Int]("n_frames") == 5)
    // doc 1: PNG, width wraps the 96 modulus
    assert(byId(1L).getAs[String]("mime") == "image/png")
    assert(byId(1L).getAs[Int]("width") == 700 % 96 + 1)
    assert(byId(1L).getAs[Int]("height") == 700 % 64 + 1)
    assert(byId(1L).getAs[Int]("n_frames") == 1)
    // doc 2: degenerate 1x1 PNG still decodes
    assert(byId(2L).getAs[Int]("width") == 1)
    assert(byId(2L).getAs[Int]("height") == 1)
    // n_bytes is the true encoded size (image files, not text lengths)
    assert(byId(1L).getAs[Long]("n_bytes") > 0)
    assert(byId(1L).getAs[Long]("n_bytes") != 700L)
  }

  test("PNG roundtrip is bit-exact: decoded pixels match the render formula") {
    val bytes = Multimodal.renderPayload(id = 1L, len = 700)
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    assert(img.getWidth == 700 % 96 + 1 && img.getHeight == 700 % 64 + 1)
    val raster = img.getRaster
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      assert(raster.getSample(x, y, 0) ==
        Multimodal.pixelValue(1L, 0, x, y), s"pixel ($x,$y)")
  }

  test("animated GIF frame count comes from the real stream scan") {
    val bytes = Multimodal.renderPayload(id = 4L, len = 7) // 7%8+2 = 9 frames
    val Seq(meta) = Multimodal.ImageIoCodec.decodeBatch(Seq(bytes))
    assert(meta.mime == "image/gif" && meta.nFrames == 9)
    assert(meta.width == 8 && meta.height == 8) // 7%96+1, 7%64+1
  }

  test("unrecognized payload degrades to octet-stream, not a task failure") {
    val junk = "definitely not an image".getBytes("UTF-8")
    val Seq(meta) = Multimodal.ImageIoCodec.decodeBatch(Seq(junk))
    assert(meta == Multimodal.Meta("application/octet-stream", 0, 0, 0,
      junk.length.toLong))
  }

  test("decode runs in batches smaller than a partition") {
    val many = spark.range(200).selectExpr("id as doc_id",
      "repeat('a', cast(id as int)) as text").coalesce(1)
    val decoded = Multimodal.decodeMeta(
      Multimodal.attachImagePayload(many), batchSize = 16)
    assert(decoded.count() == 200)
    // width must equal each row's own formula, proving batch alignment
    assert(decoded.filter("width <> cast(doc_id as int) % 96 + 1")
      .count() == 0)
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

  test("sampleFrames emits every step-th frame index over real GIF counts") {
    val decoded = Multimodal.decodeMeta(Multimodal.attachImagePayload(
      Seq((8L, "y" * 15)).toDF("doc_id", "text"))) // GIF: 15%8+2 = 9 frames
    val frames = Multimodal.sampleFrames(decoded, step = 4)
      .as[(Long, Int)].collect().toSeq.sorted
    assert(frames == Seq((8L, 0), (8L, 4), (8L, 8)))
    // single-frame PNG row -> exactly frame 0
    val png = Multimodal.decodeMeta(Multimodal.attachImagePayload(
      Seq((3L, "abc")).toDF("doc_id", "text")))
    assert(Multimodal.sampleFrames(png, step = 4)
      .as[(Long, Int)].collect().toSeq == Seq((3L, 0)))
  }
}
