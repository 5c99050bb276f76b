package graft.streaming

import java.nio.file.Files

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  test("first occurrence per fingerprint survives across micro-batches") {
    val work = Files.createTempDirectory("graft_sdedup_").toString
    val emitted =
      new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def run(): Unit = {
      val schema = Seq((0L, "x")).toDF("doc_id", "text").schema
      val q = StreamingDedup.firstSeen(
        spark.readStream.schema(schema).parquet(s"$work/docs"))
        .writeStream
        .outputMode("append")
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[(Long, String)], _: Long) =>
            batch.collect().foreach(p => emitted.add(p._1))
        }
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // batch 1: doc 10 and its exact dup 11 (same batch), unique 12
    Seq((10L, "same content here"), (11L, "same  CONTENT here"),
      (12L, "unique one")).toDF("doc_id", "text")
      .write.parquet(s"$work/docs")
    run()
    // batch 2: another dup of 10's content, plus a fresh doc
    Seq((13L, "same content here"), (14L, "brand new"))
      .toDF("doc_id", "text")
      .write.mode("append").parquet(s"$work/docs")
    run()
    import scala.jdk.CollectionConverters._
    // 11 collapses into 10 within batch 1 (min id); 13 is suppressed by
    // state carried across the restart; 12 and 14 are unique
    assert(emitted.asScala.toSet == Set(10L, 12L, 14L))
  }
}
