package graft.streaming

import java.nio.file.Files

import graft.TestSpark
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class StreamJoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def collectStream(df: DataFrame, ckpt: String,
      project: Row => String): Seq[String] = {
    val out = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q = df.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.collect().foreach(r => out.add(project(r)))
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    out.asScala.toSeq.sorted
  }

  test("stream-static join enriches per micro-batch") {
    val work = Files.createTempDirectory("graft_ssj_").toString
    val events = Seq((1, "click"), (2, "view"), (3, "click"))
      .toDF("uid", "etype")
    events.write.parquet(s"$work/ev")
    val dim = Seq((1, "alice"), (2, "bob")).toDF("uid", "name")
    val joined = StreamJoins.streamStatic(
      spark.readStream.schema(events.schema).parquet(s"$work/ev"),
      dim, Seq("uid"))
    val got = collectStream(joined, s"$work/ckpt",
      r => s"${r.getInt(0)}:${r.getString(1)}:${r.getString(2)}")
    assert(got == Seq("1:click:alice", "2:view:bob")) // uid 3 unmatched
  }

  test("stream-stream interval join matches within the window only") {
    val work = Files.createTempDirectory("graft_ss2_").toString
    def ts(s: String) = s"2024-01-01 $s"
    val clicks = Seq((1, ts("10:00:00")), (2, ts("10:00:00")))
      .toDF("uid", "tss")
      .select($"uid", to_timestamp($"tss").as("cts"))
    val buys = Seq(
      (1, ts("10:05:00")), // within 10 min of click -> match
      (2, ts("10:30:00")), // too late -> no match
      (3, ts("10:01:00"))) // no click at all
      .toDF("uid", "tss")
      .select($"uid", to_timestamp($"tss").as("bts"))
    clicks.write.parquet(s"$work/clicks")
    buys.write.parquet(s"$work/buys")
    val joined = StreamJoins.streamStreamInterval(
      spark.readStream.schema(clicks.schema).parquet(s"$work/clicks"),
      spark.readStream.schema(buys.schema).parquet(s"$work/buys"),
      Seq("uid"), "cts", "bts", within = "10 MINUTES", delay = "1 hour")
    val got = collectStream(joined.select(col("l.uid")), s"$work/ckpt",
      r => r.getInt(0).toString)
    assert(got == Seq("1"))
  }

  test("left-outer interval join: nulls only after the watermark " +
      "proves the window closed") {
    val work = Files.createTempDirectory("graft_ss2l_").toString
    def ts(s: String) = s"2024-01-01 $s"
    def click(rows: (Int, Int, String)*) = rows.toDF("uid", "cid", "tss")
      .select($"uid", $"cid", to_timestamp($"tss").as("cts"))
    def buy(rows: (Int, Int, String)*) = rows.toDF("uid", "bid", "tss")
      .select($"uid", $"bid", to_timestamp($"tss").as("bts"))
    // uid 1 matches; uid 2's buy is outside the 10-min window — it
    // must surface with a NULL bid, but only once the watermark passes
    click((1, 10, ts("10:00:00")), (2, 20, ts("10:00:00")))
      .write.mode("append").parquet(s"$work/clicks")
    buy((1, 100, ts("10:05:00")), (2, 200, ts("10:30:00")))
      .write.mode("append").parquet(s"$work/buys")
    def joined() = StreamJoins.streamStreamInterval(
      spark.readStream.schema(click((0, 0, ts("00:00:00"))).schema)
        .parquet(s"$work/clicks"),
      spark.readStream.schema(buy((0, 0, ts("00:00:00"))).schema)
        .parquet(s"$work/buys"),
      Seq("uid"), "cts", "bts", within = "10 MINUTES",
      delay = "0 seconds", joinType = "leftOuter")
      .select(col("l.uid"), col("l.cid"), col("r.bid"))
    def fmt(r: Row) =
      s"${r.getInt(0)}:${r.getInt(1)}:" +
        (if (r.isNullAt(2)) "null" else r.getInt(2).toString)
    // run 1: real data — the inner match emits, the outer row is HELD
    // (watermark is still at the epoch when the batch runs)
    val first = collectStream(joined(), s"$work/ckpt", fmt)
    assert(first == Seq("1:10:100"))
    // sentinel run under a reserved uid advances the watermark past
    // every real window; now (and only now) the unmatched click emits
    click((99, 990, ts("23:00:00")))
      .write.mode("append").parquet(s"$work/clicks")
    buy((99, 991, ts("23:00:00")))
      .write.mode("append").parquet(s"$work/buys")
    val second = collectStream(joined(), s"$work/ckpt", fmt)
    assert(second == Seq("2:20:null", "99:990:991"))
  }

  test("streaming as-of enrich replay == batch AsofJoin.asof, " +
      "any batch split, plain and bucketed") {
    import graft.operators.AsofJoin
    val work = Files.createTempDirectory("graft_sasof_").toString
    // profile versions: (uid, ts, ver); clicks: (uid, ts, cid)
    val profiles = Seq(
      (1, 10L, 100L), (1, 30L, 101L), (1, 30L, 102L), // tie at ts=30
      (2, 20L, 200L),
      (3, 99L, 300L))
      .toDF("uid", "pts", "ver")
    profiles.write.parquet(s"$work/profiles")
    val clicks = Seq(
      (1, 5L, 1L), (1, 10L, 2L), (1, 35L, 3L),  // before / tie / after
      (2, 25L, 4L), (2, 19L, 5L),
      (4, 50L, 6L))                             // key with no profile
      .toDF("uid", "cts", "cid")
    // three files -> three micro-batches
    (0 until 3).foreach { i =>
      clicks.filter($"cid" % 3 === i).repartition(1)
        .write.mode("append").parquet(s"$work/clicks")
    }
    val expected = AsofJoin.asof(clicks, profiles, Seq("uid"),
      "cts", "pts", Seq("ver"), tiebreak = "ver")
      .select("cid", "r_ver").as[(Long, Option[Long])]
      .collect().toMap
    for (width <- Seq(None, Some(16L))) {
      val outDir = s"$work/out_${width.getOrElse(0L)}"
      val q = StreamJoins.streamAsofEnrich(
        spark.readStream.schema(clicks.schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$work/clicks"),
        () => spark.read.parquet(s"$work/profiles"),
        Seq("uid"), "cts", "pts", Seq("ver"), tiebreak = "ver",
        bucketWidth = width) { (batch, _) =>
        batch.write.mode("append").parquet(outDir)
      }
        .option("checkpointLocation", s"$outDir.ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val got = spark.read.parquet(outDir)
        .select("cid", "r_ver").as[(Long, Option[Long])]
        .collect().toMap
      assert(got == expected, s"bucketWidth=$width")
    }
    // spot semantics: tie at ts=30 -> greatest ver wins; no-profile null
    assert(expected(3L).contains(102L))
    assert(expected(2L).contains(100L)) // equal ts visible
    assert(expected(1L).isEmpty && expected(6L).isEmpty)
  }
}
