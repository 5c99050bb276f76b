package graft.streaming

import java.nio.file.Files

import graft.TestSpark
import graft.config.{Rule, SyncConfig}
import graft.model.{Catalog, TableDef}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** One multi-table envelope stream → per-table merge targets — the
  * reference's whole topology in a single streaming query. */
class CdcPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def envelope(rows: (Long, String, String, String,
      Map[String, String], Map[String, String])*): DataFrame =
    rows.toDF("seq", "schema", "table", "op", "key", "after")
      .withColumn("tsMs", $"seq")
      .withColumn("before",
        org.apache.spark.sql.functions.lit(null)
          .cast("map<string,string>"))
      .select("seq", "tsMs", "schema", "table", "op", "key", "before",
        "after")

  test("two tables, one stream: routed merges + rename + unruled drop") {
    val work = Files.createTempDirectory("graft_pipe_").toString
    val cat = new Catalog()
    cat.register("db", "adv", TableDef(StructType(Seq(
      StructField("id", IntegerType), StructField("title", StringType))),
      Seq("id")))
    cat.register("db", "usr", TableDef(StructType(Seq(
      StructField("uid", LongType), StructField("name", StringType))),
      Seq("uid")))
    val cfg = SyncConfig(rules = Seq(
      Rule("db", "adv", "sink", "adv_t",
        fieldMapping = Map("title" -> "es_title")),
      Rule("db", "usr", "sink", "usr_t")),
      ignoreUpdates = false, ignoreDeletes = false, // full merge path
      flushIntervalMs = 0) // AvailableNow

    envelope(
      (1L, "db", "adv", "I", Map("id" -> "1"),
        Map("id" -> "1", "title" -> "t1")),
      (2L, "db", "usr", "I", Map("uid" -> "7"),
        Map("uid" -> "7", "name" -> "n7")),
      (3L, "db", "adv", "U", Map("id" -> "1"),
        Map("id" -> "1", "title" -> "t1b")),
      (4L, "db", "ghost", "I", Map("id" -> "9"), Map("id" -> "9")),
      (5L, "db", "usr", "D", Map("uid" -> "7"), null),
      (6L, "db", "usr", "I", Map("uid" -> "8"),
        Map("uid" -> "8", "name" -> "n8")))
      .write.parquet(s"$work/changes")

    val views = CdcPipeline.replayToCompletion(spark, s"$work/changes",
      cfg, cat, s"$work/targets", s"$work/ckpt")
    assert(views.keySet == Set(("sink", "adv_t"), ("sink", "usr_t")))
    val adv = views(("sink", "adv_t"))
    assert(adv.columns.toSeq == Seq("id", "es_title"))
    assert(adv.as[(Int, String)].collect().toSet == Set((1, "t1b")))
    val usr = views(("sink", "usr_t")).as[(Long, String)].collect().toSet
    assert(usr == Set((8L, "n8"))) // uid 7 deleted
    // the unruled 'ghost' table produced no target
    assert(!new java.io.File(s"$work/targets/sink.ghost").exists())
  }

  test("include filter prunes unruled tables at the scan (pushdown)") {
    val work = Files.createTempDirectory("graft_pipe_flt_").toString
    envelope(
      (1L, "db", "adv", "I", Map("id" -> "1"), Map("id" -> "1")),
      (2L, "db", "ghost", "I", Map("id" -> "9"), Map("id" -> "9")),
      (3L, "other", "adv", "I", Map("id" -> "3"), Map("id" -> "3")))
      .write.parquet(s"$work/changes")
    val rules = Seq(Rule("db", "adv", "sink", "adv_t"))
    val filtered = spark.read
      .schema(graft.model.ChangeEvent.envelopeSchema)
      .parquet(s"$work/changes")
      .where(CdcPipeline.includeFilter(rules))
    // the rule-key equality predicate must reach the parquet scan
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters:"), scan)
    assert(scan.contains("EqualTo(table,adv)"), scan)
    assert(filtered.count() == 1)
    // wildcard specs filter by anchored regex (not pushable, still early)
    val wide = spark.read
      .schema(graft.model.ChangeEvent.envelopeSchema)
      .parquet(s"$work/changes")
      .where(CdcPipeline.includeFilter(
        Seq(Rule("db", "a.*", "sink", "all_a"))))
    assert(wide.select("seq").as[Long].collect().toSet == Set(1L))
  }

  test("wildcard rule: shards merge into one sink; CREATE TABLE " +
      "mid-stream syncs without restart") {
    val work = Files.createTempDirectory("graft_pipe_wc_").toString
    val shardSchema = StructType(Seq(
      StructField("id", IntegerType), StructField("msg", StringType)))
    val cat = new Catalog()
    cat.register("db", "logs_01", TableDef(shardSchema, Seq("id")))
    // ONE wildcard rule: every logs_* shard converges into sink.logs_all
    val cfg = SyncConfig(
      rules = Seq(Rule("db", "logs_.*", "sink", "logs_all")),
      ignoreUpdates = false, ignoreDeletes = false,
      flushIntervalMs = 100)
    envelope((1L, "db", "logs_01", "I", Map("id" -> "1"),
      Map("id" -> "1", "msg" -> "a")))
      .write.parquet(s"$work/changes")
    val target = CdcPipeline.targetDir(s"$work/targets", "sink", "logs_all")
    val state = Seq((1, "x", "I", 1L)).toDF("id", "msg", "_op", "_seq")
      .schema
    def viewCount(): Long = scala.util.Try(
      CdcStream.currentView(spark, target, state).count()).getOrElse(0L)
    def poll(want: Long): Unit = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (viewCount() != want && System.nanoTime() < deadline)
        Thread.sleep(150)
      assert(viewCount() == want, s"expected $want rows in time")
    }
    val q = CdcPipeline.start(spark, s"$work/changes", () => cfg, cat,
      s"$work/targets", s"$work/ckpt", trigger = None)
    try {
      poll(1)
      // CREATE TABLE logs_02 (matches the wildcard) + first events —
      // the running stream must expand the rule on the next batch
      cat.register("db", "logs_02", TableDef(shardSchema, Seq("id")))
      envelope(
        (2L, "db", "logs_02", "I", Map("id" -> "2"),
          Map("id" -> "2", "msg" -> "b")),
        (3L, "db", "logs_01", "I", Map("id" -> "3"),
          Map("id" -> "3", "msg" -> "c")))
        .write.mode("append").parquet(s"$work/changes")
      poll(3)
      val got = CdcStream.currentView(spark, target, state)
        .as[(Int, String)].collect().toSet
      // both shards landed in the ONE sink, no restart
      assert(got == Set((1, "a"), (2, "b"), (3, "c")))
    } finally q.stop()
  }

  test("pipeline with bucketed state: same view, partition-scoped layout") {
    val work = Files.createTempDirectory("graft_pipe_bk_").toString
    val cat = new Catalog()
    cat.register("db", "adv", TableDef(StructType(Seq(
      StructField("id", IntegerType), StructField("title", StringType))),
      Seq("id")))
    val cfg = SyncConfig(rules = Seq(Rule("db", "adv", "sink", "adv_t")),
      ignoreUpdates = false, ignoreDeletes = false, flushIntervalMs = 0)
    envelope(
      (1L, "db", "adv", "I", Map("id" -> "1"),
        Map("id" -> "1", "title" -> "a")),
      (2L, "db", "adv", "U", Map("id" -> "1"),
        Map("id" -> "1", "title" -> "a2")),
      (3L, "db", "adv", "I", Map("id" -> "2"),
        Map("id" -> "2", "title" -> "b")))
      .write.parquet(s"$work/changes")
    val nB = 4
    val q = CdcPipeline.start(spark, s"$work/changes", () => cfg, cat,
      s"$work/targets", s"$work/ckpt",
      trigger = Some(org.apache.spark.sql.streaming.Trigger
        .AvailableNow()), stateBuckets = Some(nB))
    q.awaitTermination()
    val target = CdcPipeline.targetDir(s"$work/targets", "sink", "adv_t")
    val state = Seq((1, "x", "I", 1L)).toDF("id", "title", "_op", "_seq")
      .schema
    val view = BucketedState.currentView(spark, target, state, nB)
      .as[(Int, String)].collect().toSet
    assert(view == Set((1, "a2"), (2, "b")))
    // the layout really is bucketed
    assert(new java.io.File(target).listFiles()
      .exists(_.getName.startsWith("bucket=")))
  }

  test("resume: a second drain with the same checkpoint is incremental") {
    val work = Files.createTempDirectory("graft_pipe2_").toString
    val cat = new Catalog()
    cat.register("db", "adv", TableDef(StructType(Seq(
      StructField("id", IntegerType), StructField("title", StringType))),
      Seq("id")))
    val cfg = SyncConfig(rules = Seq(Rule("db", "adv", "sink", "adv_t")),
      ignoreUpdates = false, ignoreDeletes = false,
      flushIntervalMs = 0)
    envelope((1L, "db", "adv", "I", Map("id" -> "1"),
      Map("id" -> "1", "title" -> "a")))
      .write.parquet(s"$work/changes")
    CdcPipeline.replayToCompletion(spark, s"$work/changes", cfg, cat,
      s"$work/targets", s"$work/ckpt")
    envelope((2L, "db", "adv", "U", Map("id" -> "1"),
      Map("id" -> "1", "title" -> "b")))
      .write.mode("append").parquet(s"$work/changes")
    val views = CdcPipeline.replayToCompletion(spark, s"$work/changes",
      cfg, cat, s"$work/targets", s"$work/ckpt")
    assert(views(("sink", "adv_t")).as[(Int, String)].collect().toSet ==
      Set((1, "b")))
  }
}
