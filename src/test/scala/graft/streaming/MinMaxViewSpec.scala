package graft.streaming

import java.nio.file.Files

import graft.TestSpark
import graft.operators.{CdcMerge, ChangeFeed}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental min/max view: exact agreement with a direct min/max
  * over the final LWW state (the aggregate ±delta folding cannot
  * maintain), batch-boundary independence, the delete-exposes-runner-up
  * case, group-moving updates, recompute-on-read, and replay
  * idempotence. */
class MinMaxViewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_minmax_").toString

  private val spec = MinMaxView.Spec(
    keyCols = Seq("o_orderkey"),
    groupCols = Seq("ord_month"),
    valueCols = Seq("cents"))

  private def prepared(sfDir: String): DataFrame =
    ChangeFeed.full(spark, sfDir).select(
      col("o_orderkey"),
      trunc(col("o_orderdate"), "month").as("ord_month"),
      round(col("o_totalprice") * 100).cast("long").as("cents"),
      col("_op"), col("_seq"))

  private def direct(feed: DataFrame): Seq[String] =
    CdcMerge.lastWriteWins(feed, spec.keyCols)
      .groupBy(col("ord_month"))
      .agg(count(lit(1)).as("n_live"), min(col("cents")).as("min_cents"),
        max(col("cents")).as("max_cents"))
      .collect().map(_.toString).sorted.toSeq

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def replay(work: String, feed: DataFrame,
      parts: Int): DataFrame = {
    feed.repartition(parts).write.parquet(s"$work/changes")
    MinMaxView.replayToCompletion(spark, s"$work/changes", feed.schema,
      s"$work/state", s"$work/proj", s"$work/view", s"$work/ckpt", spec,
      maxFilesPerTrigger = Some(1),
      maintenance = CdcStream.Maintenance(gcEvery = 1))
  }

  test("maintained view equals direct min/max of final LWW state") {
    val work = tmp()
    val feed = prepared(TestSpark.Sf0001)
    val got = replay(work, feed, parts = 4)
    assert(rows(got) == direct(feed))
    assert(got.columns.toSeq ==
      Seq("ord_month", "n_live", "min_cents", "max_cents"))
  }

  test("batch boundaries don't matter: 1-batch == 4-batch view") {
    val feed = prepared(TestSpark.Sf0001)
    assert(rows(replay(tmp(), feed, parts = 1)) ==
      rows(replay(tmp(), feed, parts = 4)))
  }

  test("deleting the minimum exposes the runner-up (the non-delta case)") {
    val work = tmp()
    def batch(rows: Seq[(Long, String, Long, String, Long)]): DataFrame =
      rows.toDF("o_orderkey", "ord_month", "cents", "_op", "_seq")
    val b0 = batch(Seq((1L, "g", 10L, "I", 1L), (2L, "g", 20L, "I", 2L),
      (3L, "g", 30L, "I", 3L)))
    val b1 = batch(Seq((1L, "g", 0L, "D", 4L))) // kills the min=10 row
    Seq(b0, b1).zipWithIndex.foreach { case (b, i) =>
      MinMaxView.applyBatch(b, i.toLong, s"$work/state", s"$work/proj",
        s"$work/view", spec, stateBuckets = 4, projBuckets = 4,
        viewBuckets = 4)
    }
    val got = MinMaxView.currentView(spark, s"$work/view", b0.schema, spec,
      viewBuckets = 4).as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(("g", 2L, 20L, 30L)))
  }

  test("a group-moving update splits into D@old + U@new; emptied group " +
      "leaves the view") {
    val work = tmp()
    def batch(rows: Seq[(Long, String, Long, String, Long)]): DataFrame =
      rows.toDF("o_orderkey", "ord_month", "cents", "_op", "_seq")
    val b0 = batch(Seq((1L, "a", 5L, "I", 1L), (2L, "b", 7L, "I", 2L)))
    // key 1 moves a -> b: group a empties, b absorbs 5
    val b1 = batch(Seq((1L, "b", 5L, "U", 3L)))
    Seq(b0, b1).zipWithIndex.foreach { case (b, i) =>
      MinMaxView.applyBatch(b, i.toLong, s"$work/state", s"$work/proj",
        s"$work/view", spec, stateBuckets = 4, projBuckets = 4,
        viewBuckets = 4)
    }
    val got = MinMaxView.currentView(spark, s"$work/view", b0.schema, spec,
      viewBuckets = 4).as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(("b", 2L, 5L, 7L)))
  }

  test("crash-replay of a batch is idempotent") {
    val work = tmp()
    val feed = prepared(TestSpark.Sf0001)
    val phases = Seq(
      feed.filter(col("_op") === "I"),
      feed.filter(col("_op") =!= "I"))
    phases.zipWithIndex.foreach { case (b, i) =>
      MinMaxView.applyBatch(b, i.toLong, s"$work/state", s"$work/proj",
        s"$work/view", spec, stateBuckets = 16, projBuckets = 8,
        viewBuckets = 8)
    }
    val before = rows(MinMaxView.currentView(spark, s"$work/view",
      feed.schema, spec))
    MinMaxView.applyBatch(phases(1), 1L, s"$work/state", s"$work/proj",
      s"$work/view", spec, stateBuckets = 16, projBuckets = 8,
      viewBuckets = 8)
    val after = rows(MinMaxView.currentView(spark, s"$work/view",
      feed.schema, spec))
    assert(after == before)
    assert(after == direct(feed))
  }

  test("startToJdbc serves the min/max table; emptied groups deleted") {
    val work = tmp()
    val driverOpt =
      Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    System.setProperty("derby.system.home", work)
    val url = s"jdbc:derby:$work/mmdb;create=true"
    // numeric group ids: Derby maps StringType to CLOB (same
    // limitation note as AggViewSpec's serving test)
    val s = MinMaxView.Spec(Seq("k"), Seq("g"), Seq("v"))
    val b0 = Seq((1, 1L, 10L, "I", 1L), (2, 1L, 20L, "I", 2L),
      (3, 2L, 5L, "I", 3L), (4, 3L, 7L, "I", 4L))
      .toDF("k", "g", "v", "_op", "_seq")
    // batch 1: group 1 empties; group 2's only row re-values (its
    // min AND max move — the recompute path, not a delta)
    val b1 = Seq((1, 1L, 0L, "D", 10L), (2, 1L, 0L, "D", 11L),
      (3, 2L, 6L, "U", 12L))
      .toDF("k", "g", "v", "_op", "_seq")
    b0.coalesce(1).write.parquet(s"$work/changes")
    b1.coalesce(1).write.mode("append").parquet(s"$work/changes")
    val q = MinMaxView.startToJdbc(spark, s"$work/changes", b0.schema,
      s"$work/state", s"$work/proj", s"$work/view", s"$work/ckpt", s,
      url, "mm_live", stateBuckets = 4, projBuckets = 4, viewBuckets = 4,
      maxFilesPerTrigger = Some(1), jdbcOptions = driverOpt)
    q.awaitTermination()
    val got = graft.sources.SnapshotSource
      .jdbc(spark, url, "mm_live", options = driverOpt)
    val want = MinMaxView.currentView(spark, s"$work/view", b0.schema, s,
      viewBuckets = 4)
    assert(rows(got.select(want.columns.map(col): _*)) == rows(want))
    assert(rows(got) == Seq("[2,1,6,6]", "[3,1,7,7]")) // group 1 gone
  }

  test("startToJdbc serves a distinctCols (uniqExact-style) view " +
      "end-to-end; the per-batch push is idempotent on crash-replay") {
    val work = tmp()
    val driverOpt =
      Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    System.setProperty("derby.system.home", work)
    val url = s"jdbc:derby:$work/uqdb;create=true"
    val s = MinMaxView.Spec(Seq("k"), Seq("g"), valueCols = Seq("v"),
      distinctCols = Seq("v"))
    val b0 = Seq((1, 1L, 10L, "I", 1L), (2, 1L, 10L, "I", 2L),
      (3, 1L, 20L, "I", 3L), (4, 2L, 7L, "I", 4L))
      .toDF("k", "g", "v", "_op", "_seq")
    // batch 1: group 1 loses a v=10 holder and its v=20 holder
    // (uniq 2 -> 1 — the retraction an HLL cannot do), group 2 empties
    // (the serve must DELETE its row)
    val b1 = Seq((2, 1L, 0L, "D", 10L), (3, 1L, 0L, "D", 11L),
      (4, 2L, 0L, "D", 12L))
      .toDF("k", "g", "v", "_op", "_seq")
    b0.coalesce(1).write.parquet(s"$work/changes")
    b1.coalesce(1).write.mode("append").parquet(s"$work/changes")
    val q = MinMaxView.startToJdbc(spark, s"$work/changes", b0.schema,
      s"$work/state", s"$work/proj", s"$work/view", s"$work/ckpt", s,
      url, "uniq_live", stateBuckets = 4, projBuckets = 4,
      viewBuckets = 4, maxFilesPerTrigger = Some(1),
      jdbcOptions = driverOpt)
    q.awaitTermination()
    def served(): Seq[String] = rows(graft.sources.SnapshotSource
      .jdbc(spark, url, "uniq_live", options = driverOpt))
    val first = served()
    assert(first == Seq("[1,1,10,10,1]")) // g, n_live, min, max, uniq
    // crash-replay: foreachBatch re-delivers the LAST batch after a
    // crash before checkpoint commit. Re-run batch 1 through the same
    // applyBatch + the production jdbcServe push — the served table
    // must come out byte-identical (delete-then-insert per touched
    // group, and the group-2 delete re-deletes an absent row).
    MinMaxView.applyBatch(
      spark.read.schema(b1.schema)
        .parquet(s"$work/changes").filter(col("_seq") >= 10L),
      1L, s"$work/state", s"$work/proj", s"$work/view", s,
      stateBuckets = 4, projBuckets = 4, viewBuckets = 4,
      serve = MinMaxView.jdbcServe(spark, s"$work/view", s, url,
        "uniq_live", driverOpt, 4, b0.schema, 1L))
    assert(served() == first)
    // and the served table agrees with the maintained view store
    val want = MinMaxView.currentView(spark, s"$work/view", b0.schema, s,
      viewBuckets = 4)
    assert(rows(graft.sources.SnapshotSource
      .jdbc(spark, url, "uniq_live", options = driverOpt)
      .select(want.columns.map(col): _*)) == rows(want))
  }

  test("a null group is a real group: untouched null-group rows survive " +
      "a later batch (null-safe retired/emptied/probe joins)") {
    val work = tmp()
    def batch(rows: Seq[(Long, Option[String], Long, String, Long)])
        : DataFrame =
      rows.toDF("o_orderkey", "ord_month", "cents", "_op", "_seq")
    val b0 = batch(Seq((1L, None, 10L, "I", 1L), (2L, None, 20L, "I", 2L),
      (3L, Some("g"), 5L, "I", 3L)))
    // batch 1 touches key 1 only — with null-unsafe joins the old
    // (null, 1) image never matched the new one, so the row was both
    // retired (D) and asserted (U) at the same _seq, and the pre-batch
    // probe dropped every null-group store row from the recompute
    val b1 = batch(Seq((1L, None, 11L, "U", 4L)))
    Seq(b0, b1).zipWithIndex.foreach { case (b, i) =>
      MinMaxView.applyBatch(b, i.toLong, s"$work/state", s"$work/proj",
        s"$work/view", spec, stateBuckets = 4, projBuckets = 4,
        viewBuckets = 4)
    }
    val got = MinMaxView.currentView(spark, s"$work/view", b0.schema, spec,
      viewBuckets = 4).collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == Set((None, 2L, 11L, 20L), (Some("g"), 1L, 5L, 5L)))
    // and a batch that EMPTIES the null group tombstones its view row
    val b2 = batch(Seq((1L, None, 0L, "D", 5L), (2L, None, 0L, "D", 6L)))
    MinMaxView.applyBatch(b2, 2L, s"$work/state", s"$work/proj",
      s"$work/view", spec, stateBuckets = 4, projBuckets = 4,
      viewBuckets = 4)
    val after = MinMaxView.currentView(spark, s"$work/view", b0.schema,
      spec, viewBuckets = 4).collect()
      .map(r => (Option(r.getString(0)), r.getLong(1))).toSet
    assert(after == Set((Some("g"), 1L)))
  }

  test("distinctCols: exact count(distinct) under deletes; duplicate " +
      "values keep the count until the last holder dies") {
    val work = tmp()
    val s = MinMaxView.Spec(Seq("k"), Seq("g"), valueCols = Nil,
      distinctCols = Seq("v"))
    def batch(rows: Seq[(Long, String, Long, String, Long)]): DataFrame =
      rows.toDF("k", "g", "v", "_op", "_seq")
    val b0 = batch(Seq((1L, "g", 10L, "I", 1L), (2L, "g", 10L, "I", 2L),
      (3L, "g", 20L, "I", 3L), (4L, "h", 7L, "I", 4L)))
    // delete one of the two v=10 holders AND the v=20 holder: distinct
    // drops 2 -> 1 (an HLL could not retract either)
    val b1 = batch(Seq((1L, "g", 0L, "D", 5L), (3L, "g", 0L, "D", 6L)))
    Seq(b0, b1).zipWithIndex.foreach { case (b, i) =>
      MinMaxView.applyBatch(b, i.toLong, s"$work/state", s"$work/proj",
        s"$work/view", s, stateBuckets = 4, projBuckets = 4,
        viewBuckets = 4)
    }
    val got = MinMaxView.currentView(spark, s"$work/view", b0.schema, s,
      viewBuckets = 4)
    assert(got.columns.toSeq == Seq("g", "n_live", "uniq_v"))
    assert(got.as[(String, Long, Long)].collect().toSet ==
      Set(("g", 1L, 1L), ("h", 1L, 1L)))
  }

  test("distinctCols replay equals direct count(distinct) over the LWW " +
      "state, any batch slicing") {
    val s = MinMaxView.Spec(Seq("o_orderkey"), Seq("ord_month"),
      valueCols = Seq("cents"), distinctCols = Seq("cents"))
    val feed = prepared(TestSpark.Sf0001)
    def replayS(work: String, parts: Int): DataFrame = {
      feed.repartition(parts).write.parquet(s"$work/changes")
      MinMaxView.replayToCompletion(spark, s"$work/changes", feed.schema,
        s"$work/state", s"$work/proj", s"$work/view", s"$work/ckpt", s,
        maxFilesPerTrigger = Some(1))
    }
    val direct = CdcMerge.lastWriteWins(feed, s.keyCols)
      .groupBy(col("ord_month"))
      .agg(count(lit(1)).as("n_live"), min(col("cents")).as("min_cents"),
        max(col("cents")).as("max_cents"),
        count_distinct(col("cents")).as("uniq_cents"))
      .collect().map(_.toString).sorted.toSeq
    val one = replayS(tmp(), 1)
    assert(rows(one) == direct)
    assert(rows(replayS(tmp(), 4)) == direct)
  }

  test("a failing serve joins the in-flight commits; an in-process " +
      "retry of the same batchId converges to the correct view") {
    val work = tmp()
    def batch(rows: Seq[(Long, String, Long, String, Long)]): DataFrame =
      rows.toDF("o_orderkey", "ord_month", "cents", "_op", "_seq")
    val b0 = batch(Seq((1L, "g", 10L, "I", 1L), (2L, "g", 20L, "I", 2L)))
    MinMaxView.applyBatch(b0, 0L, s"$work/state", s"$work/proj",
      s"$work/view", spec, stateBuckets = 4, projBuckets = 4,
      viewBuckets = 4)
    val b1 = batch(Seq((1L, "g", 5L, "U", 3L)))
    // the push dies mid-batch: commits may already be in flight — the
    // failure path must join them before propagating, so the retry
    // below never races an orphaned merge on its own staging dirs
    val boom = intercept[RuntimeException] {
      MinMaxView.applyBatch(b1, 1L, s"$work/state", s"$work/proj",
        s"$work/view", spec, stateBuckets = 4, projBuckets = 4,
        viewBuckets = 4, serve = _ => throw new RuntimeException("push"))
    }
    assert(boom.getMessage == "push")
    // retry of the SAME batchId (what foreachBatch does after a crash)
    MinMaxView.applyBatch(b1, 1L, s"$work/state", s"$work/proj",
      s"$work/view", spec, stateBuckets = 4, projBuckets = 4,
      viewBuckets = 4)
    val got = MinMaxView.currentView(spark, s"$work/view", b0.schema, spec,
      viewBuckets = 4).as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(("g", 2L, 5L, 20L)))
  }

  test("minMaxForGroups (recompute-on-read) agrees with the view") {
    val work = tmp()
    val feed = prepared(TestSpark.Sf0001)
    replay(work, feed, parts = 2)
    val groups = MinMaxView.currentView(spark, s"$work/view", feed.schema,
      spec).select("ord_month").limit(3)
    val onRead = MinMaxView.minMaxForGroups(spark, s"$work/proj",
      feed.schema, spec, groups)
    val fromView = MinMaxView.currentView(spark, s"$work/view",
      feed.schema, spec)
      .join(groups, Seq("ord_month"), "left_semi")
    assert(rows(onRead) == rows(fromView))
  }
}
