package graft.streaming

import java.nio.file.Files

import graft.TestSpark
import graft.operators.{CdcMerge, ChangeFeed}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental aggregate-view maintenance: exact agreement with a direct
  * aggregate of the final state, replay idempotence, zero-count group
  * drop, tombstone semantics, and touched-bucket-only writes. */
class AggViewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_aggview_").toString

  private val spec = AggView.Spec(
    keyCols = Seq("o_orderkey"),
    groupCols = Seq("ord_month"),
    measureCols = Seq("cents"))

  /** ChangeFeed projected to the view's prepared shape: key, month
    * group, exact integer cents. */
  private def prepared(sfDir: String): DataFrame =
    ChangeFeed.full(spark, sfDir).select(
      col("o_orderkey"),
      trunc(col("o_orderdate"), "month").as("ord_month"),
      round(col("o_totalprice") * 100).cast("long").as("cents"),
      col("_op"), col("_seq"))

  private def direct(feed: DataFrame): Seq[String] =
    CdcMerge.lastWriteWins(feed, spec.keyCols)
      .groupBy(col("ord_month"))
      .agg(count(lit(1)).as("cnt"), sum(col("cents")).as("sum_cents"))
      .collect().map(_.toString).sorted.toSeq

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("maintained view equals direct aggregate of final state") {
    val work = tmp()
    val feed = prepared(TestSpark.Sf0001)
    feed.repartition(4).write.parquet(s"$work/changes")
    val got = AggView.replayToCompletion(spark, s"$work/changes",
      feed.schema, s"$work/state", s"$work/view", s"$work/ckpt", spec,
      maxFilesPerTrigger = Some(1),
      maintenance = CdcStream.Maintenance(gcEvery = 1))
    assert(rows(got) == direct(feed))
    assert(got.columns.toSeq == Seq("ord_month", "cnt", "sum_cents"))
  }

  test("crash-replay of a batch is idempotent") {
    val work = tmp()
    val feed = prepared(TestSpark.Sf0001)
    val phases = Seq(
      feed.filter(col("_op") === "I"),
      feed.filter(col("_op") =!= "I"))
    phases.zipWithIndex.foreach { case (b, i) =>
      AggView.applyBatch(b, i.toLong, s"$work/state", s"$work/view", spec,
        stateBuckets = 16, viewBuckets = 8)
    }
    val before = rows(AggView.currentView(spark, s"$work/view", feed.schema,
      spec))
    // the crash: batch 1 runs again on identical input
    AggView.applyBatch(phases(1), 1L, s"$work/state", s"$work/view", spec,
      stateBuckets = 16, viewBuckets = 8)
    val after = rows(AggView.currentView(spark, s"$work/view", feed.schema,
      spec))
    assert(after == before)
    assert(after == direct(feed))
  }

  test("a failing serve joins the in-flight commits; an in-process " +
      "retry of the same batchId converges to the correct view") {
    val work = tmp()
    def batch(rows: Seq[(Long, String, Long, String, Long)]): DataFrame =
      rows.toDF("o_orderkey", "ord_month", "cents", "_op", "_seq")
    val b0 = batch(Seq((1L, "g", 10L, "I", 1L), (2L, "g", 20L, "I", 2L)))
    AggView.applyBatch(b0, 0L, s"$work/state", s"$work/view", spec,
      stateBuckets = 4, viewBuckets = 4)
    val b1 = batch(Seq((1L, "g", 5L, "U", 3L)))
    val boom = intercept[RuntimeException] {
      AggView.applyBatch(b1, 1L, s"$work/state", s"$work/view", spec,
        stateBuckets = 4, viewBuckets = 4,
        serve = _ => throw new RuntimeException("push"))
    }
    assert(boom.getMessage == "push")
    AggView.applyBatch(b1, 1L, s"$work/state", s"$work/view", spec,
      stateBuckets = 4, viewBuckets = 4)
    val got = AggView.currentView(spark, s"$work/view", b0.schema, spec,
      viewBuckets = 4).as[(String, Long, Long)].collect().toSet
    assert(got == Set(("g", 2L, 25L)))
  }

  test("a group whose live count reaches zero leaves the view") {
    val work = tmp()
    def ev(k: Int, g: String, m: Long, op: String, seq: Long) =
      (k, g, m, op, seq)
    val b0 = Seq(ev(1, "a", 10, "I", 1), ev(2, "a", 20, "I", 2),
      ev(3, "b", 5, "I", 3))
      .toDF("k", "g", "m", "_op", "_seq")
    val b1 = Seq(ev(1, "a", 0, "D", 10), ev(2, "a", 0, "D", 11))
      .toDF("k", "g", "m", "_op", "_seq")
    val s = AggView.Spec(Seq("k"), Seq("g"), Seq("m"))
    AggView.applyBatch(b0, 0L, s"$work/state", s"$work/view", s, 4, 4)
    AggView.applyBatch(b1, 1L, s"$work/state", s"$work/view", s, 4, 4)
    val view = AggView.currentView(spark, s"$work/view", b0.schema, s, 4)
    assert(rows(view) == Seq("[b,1,5]"))
  }

  test("late update below a tombstone's seq stays dead in the view") {
    val work = tmp()
    val s = AggView.Spec(Seq("k"), Seq("g"), Seq("m"))
    val b0 = Seq((1, "a", 10L, "I", 1L), (1, "a", 0L, "D", 30L))
      .toDF("k", "g", "m", "_op", "_seq")
    // the straggler: an update that was in flight when the delete won
    val b1 = Seq((1, "a", 99L, "U", 20L))
      .toDF("k", "g", "m", "_op", "_seq")
    AggView.applyBatch(b0, 0L, s"$work/state", s"$work/view", s, 4, 4)
    AggView.applyBatch(b1, 1L, s"$work/state", s"$work/view", s, 4, 4)
    val view = AggView.currentView(spark, s"$work/view", b0.schema, s, 4)
    assert(view.count() == 0)
  }

  test("startToJdbc serves the maintained view; dead groups deleted") {
    val work = tmp()
    val driverOpt =
      Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    System.setProperty("derby.system.home", work)
    val url = s"jdbc:derby:$work/aggdb;create=true"
    // numeric group ids: Derby maps StringType to CLOB, which its
    // DELETE ... WHERE g = ? cannot compare (a Derby limitation; real
    // sinks take strings — the parquet-side specs above cover them)
    val s = AggView.Spec(Seq("k"), Seq("g"), Seq("m"))
    val b0 = Seq((1, 1L, 10L, "I", 1L), (2, 1L, 20L, "I", 2L),
      (3, 2L, 5L, "I", 3L), (4, 3L, 7L, "I", 4L))
      .toDF("k", "g", "m", "_op", "_seq")
    val b1 = Seq((1, 1L, 0L, "D", 10L), (2, 1L, 0L, "D", 11L),
      (3, 2L, 6L, "U", 12L))
      .toDF("k", "g", "m", "_op", "_seq")
    // two files + maxFilesPerTrigger=1 → batch 0 bootstraps the table
    // via replace, batch 1 goes through the touched-group delta push
    b0.coalesce(1).write.parquet(s"$work/changes")
    b1.coalesce(1).write.mode("append").parquet(s"$work/changes")
    val q = AggView.startToJdbc(spark, s"$work/changes", b0.schema,
      s"$work/state", s"$work/view", s"$work/ckpt", s, url, "agg_live",
      stateBuckets = 4, viewBuckets = 4, maxFilesPerTrigger = Some(1),
      jdbcOptions = driverOpt)
    q.awaitTermination()
    val got = graft.sources.SnapshotSource
      .jdbc(spark, url, "agg_live", options = driverOpt)
    val want = AggView.currentView(spark, s"$work/view", b0.schema, s, 4)
    assert(rows(got.select(want.columns.map(col): _*)) == rows(want))
    assert(rows(got) == Seq("[2,1,6]", "[3,1,7]")) // group 1 is gone
  }

  test("a batch rewrites only the group-buckets it touches") {
    val work = tmp()
    val s = AggView.Spec(Seq("k"), Seq("g"), Seq("m"))
    val groups = ('a' to 'h').map(_.toString)
    val b0 = groups.zipWithIndex
      .map { case (g, i) => (i, g, 10L, "I", i.toLong) }
      .toDF("k", "g", "m", "_op", "_seq")
    AggView.applyBatch(b0, 0L, s"$work/state", s"$work/view", s, 4, 8)
    // batch 1 touches exactly one group
    val b1 = Seq((100, "a", 7L, "I", 100L))
      .toDF("k", "g", "m", "_op", "_seq")
    AggView.applyBatch(b1, 1L, s"$work/state", s"$work/view", s, 4, 8)
    val vdirs = new java.io.File(s"$work/view").listFiles()
      .filter(_.getName.startsWith("bucket=")).sortBy(_.getName)
      .map(d => d.getName ->
        d.listFiles().map(_.getName).filter(_.startsWith("v=")).sorted.toSeq)
      .toMap
    val withV1 = vdirs.filter(_._2.contains("v=1"))
    assert(withV1.size == 1, s"expected one touched bucket, got $vdirs")
    // and the view is still right
    val view = AggView.currentView(spark, s"$work/view", b0.schema, s, 8)
    val want = groups.map(g =>
      if (g == "a") "[a,2,17]" else s"[$g,1,10]").sorted
    assert(rows(view) == want)
  }
}
