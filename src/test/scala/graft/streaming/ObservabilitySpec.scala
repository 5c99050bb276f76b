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

  test("/stat reports master-vs-synced lag: pending files show, drain zeroes") {
    val work = Files.createTempDirectory("graft_lag_").toString
    val changes = s"$work/changes"
    val ckpt = s"$work/ckpt"
    val feed = ChangeFeed.full(spark, TestSpark.Sf0001)
    feed.coalesce(1).write.parquet(changes)
    val listener = (new Observability.CdcMetricsListener)
      .attachFileLag(spark, changes, ckpt)
    spark.streams.addListener(listener)
    try {
      def drain(): Unit = {
        val q = CdcStream.start(spark, changes, feed.schema,
          s"$work/target", ckpt, ChangeFeed.keyCols)
        q.awaitTermination()
      }
      drain()
      val drained = Observability.fileSourceLag(spark, changes, ckpt)
      assert(drained.masterFiles == 1, drained)
      assert(drained.syncedFiles == 1, drained)
      assert(drained.lag == 0, drained)
      // two more change files land while the sync is down: the master
      // position advances, the synced position does not — /stat shows
      // the gap an operator would page on
      feed.coalesce(1).write.mode("append").parquet(changes)
      feed.coalesce(1).write.mode("append").parquet(changes)
      val behind = Observability.fileSourceLag(spark, changes, ckpt)
      assert(behind.masterFiles == 3, behind)
      assert(behind.syncedFiles == 1, behind)
      assert(behind.lag == 2, behind)
      assert(listener.statReport.contains("master_position: 3"),
        listener.statReport)
      assert(listener.statReport.contains("synced_position: 1"),
        listener.statReport)
      assert(listener.statReport.contains("lag: 2"), listener.statReport)
      // resuming from the same checkpoint drains the backlog → lag 0
      drain()
      val caught = Observability.fileSourceLag(spark, changes, ckpt)
      assert(caught.masterFiles == 3 && caught.syncedFiles == 3 &&
        caught.lag == 0, caught)
      assert(listener.statReport.contains("lag: 0"), listener.statReport)
    } finally spark.streams.removeListener(listener)
  }

  test("lag probe survives retention: beyond-horizon compact, filtered") {
    // metadata-log retention can purge the per-batch source files once
    // a LATER <n>.compact subsumes them; if that compact's n is past
    // the last committed batch, the synced count must come from the
    // compact's entries filtered to batchId <= committed (ADVICE r9:
    // the old per-batch sum undercounted and inflated /stat lag)
    val work = Files.createTempDirectory("graft_lagc_").toString
    val changes = new java.io.File(s"$work/changes")
    changes.mkdirs()
    (1 to 6).foreach(i =>
      Files.write(changes.toPath.resolve(s"f$i.parquet"), "x".getBytes))
    val commits = new java.io.File(s"$work/ckpt/commits")
    commits.mkdirs()
    (0 to 2).foreach(i =>
      Files.write(commits.toPath.resolve(i.toString), "v1\n{}".getBytes))
    val src = new java.io.File(s"$work/ckpt/sources/0")
    src.mkdirs() // per-batch files 0,1,2 purged; only 3.compact remains
    val compact = Seq("v1",
      """{"path":"file:///a0","timestamp":1,"batchId":0}""",
      """{"path":"file:///a1","timestamp":2,"batchId":1}""",
      """{"path":"file:///b1","timestamp":3,"batchId":1}""",
      """{"path":"file:///a2","timestamp":4,"batchId":2}""",
      """{"path":"file:///a3","timestamp":5,"batchId":3}""",
      """{"path":"file:///b3","timestamp":6,"batchId":3}""").mkString("\n")
    Files.write(src.toPath.resolve("3.compact"), compact.getBytes)
    val lag = Observability.fileSourceLag(spark, changes.toString,
      s"$work/ckpt")
    assert(lag.masterFiles == 6, lag)
    assert(lag.syncedFiles == 4, lag) // batchIds 0..2 of the compact
    assert(lag.lag == 2, lag)
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
