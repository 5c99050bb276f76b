package graft.streaming

import java.nio.file.Files

import graft.TestSpark
import graft.operators.ChangeFeed
import org.scalatest.funsuite.AnyFunSuite

class ObservabilitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  test("streaming I/U/D counters match the feed composition (S11)") {
    val work = Files.createTempDirectory("graft_obs_").toString
    val feed = ChangeFeed.full(spark, TestSpark.Sf0001)
    feed.write.parquet(s"$work/changes")
    val listener = new Observability.CdcMetricsListener
    spark.streams.addListener(listener)
    try {
      val q = CdcStream.start(spark, s"$work/changes", feed.schema,
        s"$work/target", s"$work/ckpt", ChangeFeed.keyCols)
      q.awaitTermination()
      // progress events are delivered asynchronously after termination
      val deadline = System.currentTimeMillis() + 30000
      while (listener.events.get == 0 &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      val want = feed.groupBy("_op").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(listener.inserts.get == want.getOrElse("I", 0L))
      assert(listener.updates.get == want.getOrElse("U", 0L))
      assert(listener.deletes.get == want.getOrElse("D", 0L))
      assert(listener.statReport.contains("insert_num"))
      // the synced position (reference /stat's binlog file+pos analog)
      // rides the same report
      assert(listener.statReport.contains("position: "),
        listener.statReport)
    } finally spark.streams.removeListener(listener)
  }

  test("HTTP /stat endpoint serves the reference's plaintext counters") {
    val listener = new Observability.CdcMetricsListener
    listener.inserts.addAndGet(3)
    listener.updates.addAndGet(2)
    listener.deletes.addAndGet(1)
    listener.events.addAndGet(6)
    listener.lastProgressJson = """{"batchId":7}"""
    val server = Observability.StatServer.start(listener)
    try {
      def get(path: String): String = {
        val url = java.net.URI
          .create(s"http://127.0.0.1:${server.boundPort}$path").toURL
        val in = url.openStream()
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      }
      val stat = get("/stat")
      assert(stat.contains("insert_num: 3"), stat)
      assert(stat.contains("update_num: 2"), stat)
      assert(stat.contains("delete_num: 1"), stat)
      assert(stat.contains("events: 6"), stat)
      // counters are LIVE: a later bump shows on the next request
      listener.inserts.addAndGet(4)
      assert(get("/stat").contains("insert_num: 7"))
      assert(get("/progress").contains("\"batchId\":7"))
    } finally server.close()
  }

  test("null primary key aborts the stream (P7 hard error)") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft_pk_").toString
    Seq((Some(1), "a", "I", 1L), (None, "b", "I", 2L))
      .toDF("k", "v", "_op", "_seq")
      .write.parquet(s"$work/changes")
    val schema = Seq((Some(1), "a", "I", 1L))
      .toDF("k", "v", "_op", "_seq").schema
    val listener = new Observability.CdcMetricsListener
    spark.streams.addListener(listener)
    val ex = try {
      intercept[Exception] {
        CdcStream.replayToCompletion(spark, s"$work/changes", schema,
          s"$work/target", s"$work/ckpt", Seq("k"))
      }
    } finally ()
    try {
      def messages(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      // the abort names the table (route) and the exact null key
      // column — fail-stop attribution, not just "something was null"
      assert(messages(ex).exists(_.contains("null primary key")))
      assert(messages(ex).exists(_.contains("table=target")), messages(ex))
      assert(messages(ex).exists(_.contains("null_cols=k")), messages(ex))
      // the listener surfaces the same payload (termination events are
      // delivered asynchronously)
      val deadline = System.currentTimeMillis() + 30000
      while (listener.lastError.isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(listener.lastError.exists(_.contains("null primary key")),
        listener.lastError)
      assert(listener.statReport.contains("last_error:"),
        listener.statReport)
    } finally spark.streams.removeListener(listener)
  }
}
