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

  // --- stateful VIEWS: the mid-stream evolution contract is the
  // reference's keep-running DDL posture (river/river.go:166-180) for
  // the changes a maintained aggregate CAN absorb — an ADDITIVE
  // nullable payload column the view never folds (pre-batch state reads
  // it as null), and (r15) a DROP of such a column (the pin keeps it;
  // narrow batches are null-padded, state retains historical values) —
  // and FAIL-STOP with a rebuild instruction for everything else
  // (key/group/measure change, reserved-column drop, type change):
  // incrementally-maintained state cannot absorb those the way the
  // envelope's versioned state above does. A same-schema restart must
  // keep working.

  test("AggView: mid-stream ADD COLUMN (nullable, non-aggregated) is " +
      "absorbed; a later DROP of it is absorbed too (state keeps it)") {
    val work = Files.createTempDirectory("graft_evo_agg_").toString
    val spec = AggView.Spec(Seq("k"), Seq("g"), Seq("m"))
    val b0 = Seq((1, "g1", 10L, "I", 1L)).toDF("k", "g", "m", "_op", "_seq")
    AggView.applyBatch(b0, 0L, s"$work/state", s"$work/view", spec,
      stateBuckets = 4, viewBuckets = 4)
    // same schema: fine (the restart path)
    val b1 = Seq((2, "g1", 5L, "I", 2L)).toDF("k", "g", "m", "_op", "_seq")
    AggView.applyBatch(b1, 1L, s"$work/state", s"$work/view", spec,
      stateBuckets = 4, viewBuckets = 4)
    // ALTER TABLE ADD COLUMN extra: absorbed — the fold continues and
    // the batch's rows (including an update of a pre-DDL key, whose
    // pre-batch state reads extra as null) land correctly
    val b2 = Seq((3, "g1", 1L, Some("x"), "I", 3L),
        (1, "g1", 20L, None: Option[String], "U", 4L))
      .toDF("k", "g", "m", "extra", "_op", "_seq")
    AggView.applyBatch(b2, 2L, s"$work/state", s"$work/view", spec,
      stateBuckets = 4, viewBuckets = 4)
    val got = AggView.currentView(spark, s"$work/view", b2.schema, spec,
      viewBuckets = 4).as[(String, Long, Long)].collect().toSet
    assert(got == Set(("g1", 3L, 26L)))
    // DROP COLUMN (back to the narrow schema) is ALSO absorbed (r15 —
    // the reference refreshes TableInfo on ANY DDL and keeps syncing,
    // river/river.go:166-180): the pin KEEPS extra, the narrow batch is
    // null-padded, the fold continues
    val b3 = Seq((4, "g1", 2L, "I", 5L)).toDF("k", "g", "m", "_op", "_seq")
    val eff = AggView.applyBatch(b3, 3L, s"$work/state", s"$work/view",
      spec, stateBuckets = 4, viewBuckets = 4)
    assert(eff.fieldNames.contains("extra"),
      "effective schema must retain the dropped payload column")
    val got2 = AggView.currentView(spark, s"$work/view", b2.schema, spec,
      viewBuckets = 4).as[(String, Long, Long)].collect().toSet
    assert(got2 == Set(("g1", 4L, 28L)))
    // state kept the column: key 3's pre-drop value survives, the
    // post-drop key reads null
    val st = BucketedState.currentView(spark, s"$work/state",
      eff, 4).select("k", "extra")
      .as[(Int, Option[String])].collect().toMap
    assert(st(3).contains("x") && st(4).isEmpty)
    // re-ADD with a DIFFERENT type still fail-stops against the pin
    val b4 = Seq((5, "g1", 2L, Some(7L), "I", 6L))
      .toDF("k", "g", "m", "extra", "_op", "_seq")
    val e = intercept[IllegalStateException] {
      AggView.applyBatch(b4, 4L, s"$work/state", s"$work/view", spec,
        stateBuckets = 4, viewBuckets = 4)
    }
    assert(e.getMessage.contains("schema evolved mid-stream"))
    assert(e.getMessage.contains("rebuild"))
    // the failed batch left the view untouched
    val after = AggView.currentView(spark, s"$work/view", b2.schema, spec,
      viewBuckets = 4).as[(String, Long, Long)].collect().toSet
    assert(after == got2)
  }

  test("AggView: DROP of a MEASURE (folded) column fail-stops") {
    val work = Files.createTempDirectory("graft_evo_aggd_").toString
    val spec = AggView.Spec(Seq("k"), Seq("g"), Seq("m"))
    val b0 = Seq((1, "g1", 10L, "I", 1L)).toDF("k", "g", "m", "_op", "_seq")
    AggView.applyBatch(b0, 0L, s"$work/state", s"$work/view", spec,
      stateBuckets = 4, viewBuckets = 4)
    val b1 = Seq((2, "g1", "I", 2L)).toDF("k", "g", "_op", "_seq")
    val e = intercept[IllegalStateException] {
      AggView.applyBatch(b1, 1L, s"$work/state", s"$work/view", spec,
        stateBuckets = 4, viewBuckets = 4)
    }
    assert(e.getMessage.contains("schema evolved mid-stream"))
    assert(e.getMessage.contains("rebuild"))
  }

  test("AggView: a new NON-NULLABLE or measure-named column fail-stops") {
    val work = Files.createTempDirectory("graft_evo_agg2_").toString
    val spec = AggView.Spec(Seq("k"), Seq("g"), Seq("m"))
    val b0 = Seq((1, "g1", 10L, "I", 1L)).toDF("k", "g", "m", "_op", "_seq")
    AggView.applyBatch(b0, 0L, s"$work/state", s"$work/view", spec,
      stateBuckets = 4, viewBuckets = 4)
    // non-nullable added column: not absorbable (old state has no value
    // for it and null is not legal) — fail-stop
    val hard = b0.sparkSession.createDataFrame(
      Seq((2, "g1", 5L, 7L, "I", 2L))
        .toDF("k", "g", "m", "extra", "_op", "_seq").rdd,
      StructType(b0.schema.fields.patch(3,
        Seq(StructField("extra", org.apache.spark.sql.types.LongType,
          nullable = false)), 0)))
    intercept[IllegalStateException] {
      AggView.applyBatch(hard, 1L, s"$work/state", s"$work/view", spec,
        stateBuckets = 4, viewBuckets = 4)
    }
  }

  test("MinMaxView: mid-stream TYPE change fail-stops (pin survives a " +
      "restart); an additive nullable column is absorbed") {
    val work = Files.createTempDirectory("graft_evo_mm_").toString
    val spec = MinMaxView.Spec(Seq("k"), Seq("g"), Seq("v"))
    val b0 = Seq((1, "g1", 10L, "I", 1L)).toDF("k", "g", "v", "_op", "_seq")
    MinMaxView.applyBatch(b0, 0L, s"$work/state", s"$work/proj",
      s"$work/view", spec, stateBuckets = 4, projBuckets = 4,
      viewBuckets = 4)
    // a column TYPE change is never absorbable
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
    // additive nullable payload column: absorbed, recompute correct
    val b2 = Seq((2, "g1", 3L, Some("x"), "I", 2L))
      .toDF("k", "g", "v", "extra", "_op", "_seq")
    MinMaxView.applyBatch(b2, 1L, s"$work/state", s"$work/proj",
      s"$work/view", spec, stateBuckets = 4, projBuckets = 4,
      viewBuckets = 4)
    val got2 = MinMaxView.currentView(spark, s"$work/view", b2.schema,
      spec, viewBuckets = 4).as[(String, Long, Long, Long)].collect().toSet
    assert(got2 == Set(("g1", 2L, 3L, 10L)))
  }

  test("DedupIndex: mid-stream feed evolution — additive column " +
      "absorbed, folded-column change fail-stops with the rebuild error") {
    val work = Files.createTempDirectory("graft_evo_dd_").toString
    val cfg = DedupIndex.Config(sigBuckets = 4, bandBuckets = 4,
      pairBuckets = 4)
    val text = "the quick brown fox jumps over the lazy dog again"
    val b0 = Seq(("I", 1L, 1L, text), ("I", 2L, 2L, text))
      .toDF("_op", "_seq", "doc_id", "text")
    DedupIndex.applyBatch(b0, s"$work/store", 0L, cfg)
    assert(DedupIndex.currentPairs(spark, s"$work/store", cfg)
      .count() == 1L)
    // ADD COLUMN lang (nullable, not folded): absorbed — the index
    // keeps maintaining
    val b1 = Seq(("I", 3L, 3L, text, Some("en")))
      .toDF("_op", "_seq", "doc_id", "text", "lang")
    DedupIndex.applyBatch(b1, s"$work/store", 1L, cfg)
    assert(DedupIndex.currentPairs(spark, s"$work/store", cfg)
      .count() == 3L)
    // DROP COLUMN lang (absorbed, r15): the index keeps maintaining
    val b1b = Seq(("I", 4L, 4L, text))
      .toDF("_op", "_seq", "doc_id", "text")
    DedupIndex.applyBatch(b1b, s"$work/store", 2L, cfg)
    assert(DedupIndex.currentPairs(spark, s"$work/store", cfg)
      .count() == 6L)
    // doc_id TYPE change (long → int): the folded key column changed —
    // fail-stop, store untouched
    val b2 = Seq(("I", 5L, 5, text, "en"))
      .toDF("_op", "_seq", "doc_id", "text", "lang")
    val e = intercept[IllegalStateException] {
      DedupIndex.applyBatch(b2, s"$work/store", 3L, cfg)
    }
    assert(e.getMessage.contains("schema evolved mid-stream"))
    assert(e.getMessage.contains("rebuild"))
    assert(DedupIndex.currentPairs(spark, s"$work/store", cfg)
      .count() == 6L)
  }
}
