package graft.streaming

import java.nio.file.Files

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EventTimeWindowsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def evts(rows: (String, String)*): DataFrame =
    rows.toDF("tss", "user")
      .select(to_timestamp($"tss").as("ts"), $"user")

  test("batch: tumbling/sliding/session shapes") {
    val df = evts(
      ("2024-01-01 10:15:00", "u1"), ("2024-01-01 10:45:00", "u1"),
      ("2024-01-01 11:20:00", "u1"), ("2024-01-01 13:00:00", "u1"))
    val tumb = EventTimeWindows.tumbling(df, "ts", "1 hour", Seq("user"),
      Seq(count(lit(1)).as("n")))
      .select($"win_start".cast("string"), $"n")
      .as[(String, Long)].collect().toMap
    assert(tumb == Map("2024-01-01 10:00:00" -> 2L,
      "2024-01-01 11:00:00" -> 1L, "2024-01-01 13:00:00" -> 1L))
    val slid = EventTimeWindows.sliding(df, "ts", "2 hours", "1 hour",
      Seq("user"), Seq(count(lit(1)).as("n")))
    // each event lands in exactly 2 panes
    assert(slid.agg(sum($"n")).as[Long].collect()(0) == 8L)
    // 10:15..11:20 chain one session (gaps < 45m); 13:00 separate
    val sess = EventTimeWindows.sessions(df, "ts", "45 minutes",
      Seq("user"), Seq(count(lit(1)).as("n")))
      .select($"win_start".cast("string"), $"n")
      .as[(String, Long)].collect().toMap
    assert(sess == Map("2024-01-01 10:15:00" -> 3L,
      "2024-01-01 13:00:00" -> 1L))
  }

  test("streaming: watermark drops data later than the delay") {
    val work = Files.createTempDirectory("graft_wm_").toString
    val batch1 = evts(
      ("2024-01-01 10:15:00", "u1"), ("2024-01-01 10:45:00", "u1"),
      ("2024-01-01 11:15:00", "u1"))
    batch1.write.parquet(s"$work/events")
    val emitted =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    def run(): Unit = {
      val stream = spark.readStream.schema(batch1.schema)
        .parquet(s"$work/events")
      val q = EventTimeWindows.tumblingStream(stream, "ts", "1 hour",
        "30 minutes", Seq("user"), Seq(count(lit(1)).as("n")))
        .writeStream
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.select(col("win_start").cast("string"), col("n"))
            .collect().foreach(r =>
              emitted.add((r.getString(0), r.getLong(1))))
        }
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run() // watermark advances to 10:45; nothing finalized yet
    // batch 2: one event 75+ minutes late (< watermark), one fresh
    evts(("2024-01-01 09:30:00", "u1"), ("2024-01-01 12:15:00", "u1"))
      .write.mode("append").parquet(s"$work/events")
    run() // watermark -> 11:45: windows 10:00 and 11:00 finalize
    import scala.jdk.CollectionConverters._
    val got = emitted.asScala.toMap
    // the 09:30 late event would have put a 09:00 window here — dropped;
    // the 11:00 and 12:00 windows are not finalized (their ends 12:00 /
    // 13:00 still exceed the 11:45 watermark), so exactly one window out
    assert(got == Map("2024-01-01 10:00:00" -> 2L))
  }

  test("streaming sessions: a session straddling two runs merges in " +
      "state, then closes once and only once") {
    val work = Files.createTempDirectory("graft_sess_").toString
    val schema = evts(("2024-01-01 10:00:00", "u1")).schema
    val emitted =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, String, Long)]()
    def run(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(s"$work/events")
      val q = EventTimeWindows.sessionsStream(stream, "ts", "30 minutes",
        "1 second", Seq("user"), Seq(count(lit(1)).as("n")))
        .writeStream
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.select(col("user"), col("win_start").cast("string"),
              col("n"))
            .collect().foreach(r =>
              emitted.add((r.getString(0), r.getString(1), r.getLong(2))))
        }
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // run 1: u1 session open (10:00, 10:20); u2 session (10:00)
    evts(("2024-01-01 10:00:00", "u1"), ("2024-01-01 10:20:00", "u1"),
      ("2024-01-01 10:00:00", "u2"))
      .write.mode("append").parquet(s"$work/events")
    run()
    // run 2: 10:40 is within 30m of u1's 10:20 -> MUST merge into the
    // open session, not start a new one; u2's session (ended 10:30)
    // closes as the watermark passes it
    evts(("2024-01-01 10:40:00", "u1")).write.mode("append")
      .parquet(s"$work/events")
    run()
    // run 3: sentinel far ahead closes u1's merged session
    evts(("2024-01-02 10:00:00", "zz")).write.mode("append")
      .parquet(s"$work/events")
    run()
    import scala.jdk.CollectionConverters._
    val got = emitted.asScala.toSet
    assert(got == Set(
      ("u1", "2024-01-01 10:00:00", 3L), // one MERGED session, emitted once
      ("u2", "2024-01-01 10:00:00", 1L)))
  }
}
