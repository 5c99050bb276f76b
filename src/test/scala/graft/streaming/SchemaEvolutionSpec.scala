package graft.streaming

import java.nio.file.Files

import graft.TestSpark
import graft.config.{Rule, SyncConfig}
import graft.model.{Catalog, TableDef}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** ST6: DDL mid-stream — the reference refreshes TableInfo on
  * OnTableChanged and subsequent events carry the new column set
  * (river/sync.go:54-65, exercised by the stale suite at
  * river/river_test.go:385-399). Two engine paths: the LIVE path (the
  * envelope pipeline re-resolves the registry per micro-batch — refresh
  * applies on the next batch, no restart), and the restart path for
  * typed streams (same checkpoint, refreshed schema); the versioned
  * state absorbs added/dropped columns on read either way. */
class SchemaEvolutionSpec extends AnyFunSuite {
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

  test("in-flight ADD COLUMN: catalog refresh lands on the next " +
      "micro-batch, no restart") {
    val work = Files.createTempDirectory("graft_evo_live_").toString
    val cat = new Catalog()
    val v1 = StructType(Seq(StructField("id", IntegerType),
      StructField("title", StringType)))
    cat.register("db", "adv", TableDef(v1, Seq("id")))
    val cfg = SyncConfig(rules = Seq(Rule("db", "adv", "sink", "adv_t")),
      ignoreUpdates = false, ignoreDeletes = false,
      flushIntervalMs = 100) // live ProcessingTime trigger
    envelope((1L, "db", "adv", "I", Map("id" -> "1"),
      Map("id" -> "1", "title" -> "t1")))
      .write.parquet(s"$work/changes")
    val target = CdcPipeline.targetDir(s"$work/targets", "sink", "adv_t")
    val stateV1 = Seq((1, "t1", "I", 1L))
      .toDF("id", "title", "_op", "_seq").schema
    val q = CdcPipeline.start(spark, s"$work/changes", cfg, cat,
      s"$work/targets", s"$work/ckpt")
    try {
      def poll(until: () => Boolean): Unit = {
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        while (!until() && System.nanoTime() < deadline) Thread.sleep(150)
        assert(until(), "stream did not reach expected state in time")
      }
      poll(() => scala.util.Try(CdcStream.currentView(spark, target,
        stateV1).count()).getOrElse(0L) == 1L)

      // ALTER TABLE adv ADD COLUMN flag — refresh the LIVE registry;
      // the running stream must pick it up on the next batch
      val v2 = v1.add(StructField("flag", StringType))
      cat.refresh("db", "adv", TableDef(v2, Seq("id")))
      envelope((2L, "db", "adv", "I", Map("id" -> "2"),
        Map("id" -> "2", "title" -> "t2", "flag" -> "y")))
        .write.mode("append").parquet(s"$work/changes")

      val stateV2 = Seq((1, "t1", "x", "I", 1L))
        .toDF("id", "title", "flag", "_op", "_seq").schema
      poll(() => scala.util.Try(CdcStream.currentView(spark, target,
        stateV2).count()).getOrElse(0L) == 2L)
      val got = CdcStream.currentView(spark, target, stateV2)
        .as[(Int, String, Option[String])].collect().toSet
      // post-DDL events carry the new column; pre-DDL state reads null
      assert(got == Set((1, "t1", None), (2, "t2", Some("y"))))
    } finally q.stop()
  }

  test("ADD COLUMN mid-stream: old state rows read as null for new col") {
    val work = Files.createTempDirectory("graft_evo_").toString
    // phase 1: two-column payload
    Seq((1, "a", "I", 1L), (2, "b", "I", 2L))
      .toDF("k", "v", "_op", "_seq")
      .write.parquet(s"$work/changes")
    val s1 = Seq((1, "a", "I", 1L)).toDF("k", "v", "_op", "_seq").schema
    CdcStream.replayToCompletion(spark, s"$work/changes", s1,
      s"$work/target", s"$work/ckpt", Seq("k"))
    // DDL: ALTER TABLE ADD COLUMN extra — new events carry it
    Seq((2, "b2", "x", "U", 10L), (3, "c", "y", "I", 11L))
      .toDF("k", "v", "extra", "_op", "_seq")
      .write.mode("append").parquet(s"$work/changes")
    val s2 = Seq((1, "a", "x", "I", 1L))
      .toDF("k", "v", "extra", "_op", "_seq").schema
    val got = CdcStream.replayToCompletion(spark, s"$work/changes", s2,
      s"$work/target", s"$work/ckpt", Seq("k"))
      .as[(Int, String, Option[String])].collect().toSet
    assert(got == Set((1, "a", None), (2, "b2", Some("x")),
      (3, "c", Some("y"))))
  }

  test("DROP COLUMN mid-stream: narrower schema ignores stored extras") {
    val work = Files.createTempDirectory("graft_evo_").toString
    Seq((1, "a", "x", "I", 1L)).toDF("k", "v", "extra", "_op", "_seq")
      .write.parquet(s"$work/changes")
    val wide = Seq((1, "a", "x", "I", 1L))
      .toDF("k", "v", "extra", "_op", "_seq").schema
    CdcStream.replayToCompletion(spark, s"$work/changes", wide,
      s"$work/target", s"$work/ckpt", Seq("k"))
    Seq((2, "b", "I", 10L)).toDF("k", "v", "_op", "_seq")
      .write.mode("append").parquet(s"$work/changes")
    val narrow = Seq((1, "a", "I", 1L)).toDF("k", "v", "_op", "_seq").schema
    val got = CdcStream.replayToCompletion(spark, s"$work/changes", narrow,
      s"$work/target", s"$work/ckpt", Seq("k"))
      .as[(Int, String)].collect().toSet
    assert(got == Set((1, "a"), (2, "b")))
  }

  // --- stateful VIEWS: the defined contract for mid-stream evolution
  // is FAIL-STOP with a rebuild instruction (incrementally-maintained
  // aggregate state cannot absorb a schema change the way the
  // envelope's versioned state above does) — and a same-schema restart
  // must keep working.

  test("AggView: mid-stream ADD COLUMN fail-stops with a rebuild error; " +
      "same-schema batches keep folding") {
    val work = Files.createTempDirectory("graft_evo_agg_").toString
    val spec = AggView.Spec(Seq("k"), Seq("g"), Seq("m"))
    val b0 = Seq((1, "g1", 10L, "I", 1L)).toDF("k", "g", "m", "_op", "_seq")
    AggView.applyBatch(b0, 0L, s"$work/state", s"$work/view", spec,
      stateBuckets = 4, viewBuckets = 4)
    // same schema: fine (the restart path)
    val b1 = Seq((2, "g1", 5L, "I", 2L)).toDF("k", "g", "m", "_op", "_seq")
    AggView.applyBatch(b1, 1L, s"$work/state", s"$work/view", spec,
      stateBuckets = 4, viewBuckets = 4)
    // ALTER TABLE ADD COLUMN extra: the view must fail-stop, not fold
    val b2 = Seq((3, "g1", 1L, "x", "I", 3L))
      .toDF("k", "g", "m", "extra", "_op", "_seq")
    val e = intercept[IllegalStateException] {
      AggView.applyBatch(b2, 2L, s"$work/state", s"$work/view", spec,
        stateBuckets = 4, viewBuckets = 4)
    }
    assert(e.getMessage.contains("schema evolved mid-stream"))
    assert(e.getMessage.contains("rebuild"))
    // the failed batch left the view untouched
    val got = AggView.currentView(spark, s"$work/view", b0.schema, spec,
      viewBuckets = 4).as[(String, Long, Long)].collect().toSet
    assert(got == Set(("g1", 2L, 15L)))
  }

  test("MinMaxView: mid-stream schema change fail-stops; the pin " +
      "survives a restart") {
    val work = Files.createTempDirectory("graft_evo_mm_").toString
    val spec = MinMaxView.Spec(Seq("k"), Seq("g"), Seq("v"))
    val b0 = Seq((1, "g1", 10L, "I", 1L)).toDF("k", "g", "v", "_op", "_seq")
    MinMaxView.applyBatch(b0, 0L, s"$work/state", s"$work/proj",
      s"$work/view", spec, stateBuckets = 4, projBuckets = 4,
      viewBuckets = 4)
    // a column TYPE change is a schema change too
    val b1 = Seq((2, "g1", "wide", "I", 2L))
      .toDF("k", "g", "v", "_op", "_seq")
    val e = intercept[IllegalStateException] {
      MinMaxView.applyBatch(b1, 1L, s"$work/state", s"$work/proj",
        s"$work/view", spec, stateBuckets = 4, projBuckets = 4,
        viewBuckets = 4)
    }
    assert(e.getMessage.contains("schema evolved mid-stream"))
    val got = MinMaxView.currentView(spark, s"$work/view", b0.schema, spec,
      viewBuckets = 4).as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(("g1", 1L, 10L, 10L)))
  }
}
