package graft.streaming

import java.nio.file.Files

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class StreamCooccurSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def harness(): (DataFrame => Unit, () => Unit, () => Map[(Long, String, String), Long]) = {
    val work = Files.createTempDirectory("cooc_spec_").toString
    val schema = Seq((1L, "a")).toDF("user_id", "event_type").schema
    val feed = (df: DataFrame) =>
      df.coalesce(1).write.mode("append").parquet(s"$work/in")
    val run = () => {
      val q = StreamCooccur.pairDeltas(
        spark.readStream.schema(schema).parquet(s"$work/in"),
        "user_id", "event_type")
        .toDF().writeStream
        .option("checkpointLocation", s"$work/ckpt")
        .outputMode("append")
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("append").parquet(s"$work/out")
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val read = () =>
      spark.read.parquet(s"$work/out")
        .as[(Long, String, String)].collect()
        .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    (feed, run, read)
  }

  test("pairs complete across batches; re-delivery emits nothing") {
    val (feed, run, read) = harness()
    feed(Seq((1L, "a"), (1L, "b"), (2L, "x")).toDF("user_id", "event_type"))
    run()
    assert(read() == Map((1L, "a", "b") -> 1L))
    // batch 2: u1 gains c (pairs vs BOTH prior items), u2 repeats x
    feed(Seq((1L, "c"), (2L, "x")).toDF("user_id", "event_type"))
    run()
    assert(read() == Map((1L, "a", "b") -> 1L, (1L, "a", "c") -> 1L,
      (1L, "b", "c") -> 1L))
    // full duplicate re-delivery: monotone state → zero new deltas
    feed(Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "x"))
      .toDF("user_id", "event_type"))
    run()
    val after = read()
    assert(after.values.sum == 3L && after.values.forall(_ == 1L),
      s"re-delivery must not re-emit: $after")
  }

  test("within-batch triples emit all pairs once, ordered a < b") {
    val (feed, run, read) = harness()
    feed(Seq((7L, "m"), (7L, "k"), (7L, "z")).toDF("user_id", "event_type"))
    run()
    val got = read()
    assert(got == Map((7L, "k", "m") -> 1L, (7L, "k", "z") -> 1L,
      (7L, "m", "z") -> 1L))
  }
}
