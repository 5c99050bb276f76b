package graft.streaming

import java.nio.file.Files

import graft.TestSpark
import graft.operators.{ChangeFeed, Scd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Streaming SCD2: batch-boundary independence vs the batch operator,
  * out-of-order re-linking, replay idempotence. */
class StreamScdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_streamscd_").toString

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("streamed history equals the batch scd2 of the same feed") {
    val work = tmp()
    val feed = ChangeFeed.full(spark, TestSpark.Sf0001)
    feed.repartition(4).write.parquet(s"$work/changes")
    val got = StreamScd.replayToCompletion(spark, s"$work/changes",
      feed.schema, s"$work/hist", s"$work/ckpt", ChangeFeed.keyCols,
      maxFilesPerTrigger = Some(1),
      maintenance = CdcStream.Maintenance(gcEvery = 1))
    val want = Scd.scd2(feed, ChangeFeed.keyCols)
    assert(rows(got.select(want.columns.map(col): _*)) == rows(want))
  }

  test("late event between two versions re-links both intervals") {
    val work = tmp()
    val b0 = Seq((1, "v1", "I", 10L), (1, "v3", "U", 30L))
      .toDF("k", "v", "_op", "_seq")
    val b1 = Seq((1, "v2", "U", 20L)).toDF("k", "v", "_op", "_seq")
    StreamScd.applyBatch(b0, 0L, s"$work/hist", Seq("k"), 4)
    StreamScd.applyBatch(b1, 1L, s"$work/hist", Seq("k"), 4)
    val hist = StreamScd.currentHistory(spark, s"$work/hist", b0.schema,
      Seq("k"), 4)
    assert(rows(hist) == Seq(
      "[1,v1,10,20,0]", "[1,v2,20,30,0]", "[1,v3,30,null,1]"))
  }

  test("delete closes the final interval without opening a row") {
    val work = tmp()
    val b0 = Seq((1, "v1", "I", 10L)).toDF("k", "v", "_op", "_seq")
    val b1 = Seq((1, null.asInstanceOf[String], "D", 20L))
      .toDF("k", "v", "_op", "_seq")
    StreamScd.applyBatch(b0, 0L, s"$work/hist", Seq("k"), 4)
    StreamScd.applyBatch(b1, 1L, s"$work/hist", Seq("k"), 4)
    val hist = StreamScd.currentHistory(spark, s"$work/hist", b0.schema,
      Seq("k"), 4)
    assert(rows(hist) == Seq("[1,v1,10,20,0]"))
  }

  test("crash-replay of a batch is idempotent") {
    val work = tmp()
    val feed = ChangeFeed.full(spark, TestSpark.Sf0001)
    val phases = Seq(
      feed.filter(col("_op") === "I"),
      feed.filter(col("_op") =!= "I"))
    phases.zipWithIndex.foreach { case (b, i) =>
      StreamScd.applyBatch(b, i.toLong, s"$work/hist",
        ChangeFeed.keyCols, 8)
    }
    val before = rows(StreamScd.currentHistory(spark, s"$work/hist",
      feed.schema, ChangeFeed.keyCols, 8))
    StreamScd.applyBatch(phases(1), 1L, s"$work/hist",
      ChangeFeed.keyCols, 8)
    val after = rows(StreamScd.currentHistory(spark, s"$work/hist",
      feed.schema, ChangeFeed.keyCols, 8))
    assert(after == before)
    assert(after ==
      rows(Scd.scd2(feed, ChangeFeed.keyCols)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"),
          col("valid_from"), col("valid_to"), col("is_current"))))
  }
}
