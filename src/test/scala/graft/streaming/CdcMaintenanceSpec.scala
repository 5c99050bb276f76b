package graft.streaming

import java.io.File
import java.nio.file.Files

import graft.TestSpark
import graft.operators.{CdcMerge, ChangeFeed}
import org.scalatest.funsuite.AnyFunSuite

/** The streaming loops' knob-driven state maintenance
  * ([[CdcStream.Maintenance]]): without it every micro-batch leaves a
  * full prior version behind, so storage grows linearly in batch count —
  * the reference instead overwrites its position file in place
  * (river/master.go:53-83). These specs are the VERDICT-r9 done
  * criteria: an N-batch replay ends with <= keep versions per target
  * (flat) / per bucket (bucketed), the optimized layout holds O(buckets)
  * files, and a crash between promote and GC still heals.
  */
class CdcMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_maint_").toString

  private def flatVersions(target: String): Seq[String] = {
    val d = new File(target)
    if (!d.exists()) Seq.empty
    else d.listFiles().filter(_.getName.startsWith("v=")).map(_.getName).toSeq
  }

  private def bucketVersions(target: String, b: Int): Seq[String] = {
    val d = new File(s"$target/bucket=$b")
    if (!d.exists()) Seq.empty
    else d.listFiles()
      .filter(f => f.getName.startsWith("v=") &&
        new File(f, "_GRAFT_OK").exists())
      .map(_.getName).toSeq
  }

  private def parquetFiles(dir: File): Int =
    if (!dir.exists()) 0
    else dir.listFiles().map { f =>
      if (f.isDirectory) parquetFiles(f)
      else if (f.getName.endsWith(".parquet")) 1 else 0
    }.sum

  test("flat loop with gcEvery=1 ends at keepVersions dirs, view intact") {
    val work = tmp()
    val feed = ChangeFeed.full(spark, TestSpark.Sf0001)
    feed.repartition(5).write.parquet(s"$work/changes")
    val q = CdcStream.start(spark, s"$work/changes", feed.schema,
      s"$work/target", s"$work/ckpt", ChangeFeed.keyCols,
      maxFilesPerTrigger = Some(1),
      maintenance = CdcStream.Maintenance(gcEvery = 1, keepVersions = 2))
    q.awaitTermination()
    // 5 batches ran; GC after each of batches 1..4 leaves exactly 2
    assert(flatVersions(s"$work/target").size == 2)
    val got = CdcStream.currentView(spark, s"$work/target", feed.schema)
    val want = CdcMerge.lastWriteWins(feed, ChangeFeed.keyCols)
    assert(got.collect().map(_.toString).sorted.toSeq ==
      want.collect().map(_.toString).sorted.toSeq)
  }

  test("bucketed loop with gc+optimize bounds versions AND files") {
    val work = tmp()
    val nB = 8
    val feed = ChangeFeed.full(spark, TestSpark.Sf0001)
    feed.repartition(6).write.parquet(s"$work/changes")
    val q = CdcStream.start(spark, s"$work/changes", feed.schema,
      s"$work/target", s"$work/ckpt", ChangeFeed.keyCols,
      maxFilesPerTrigger = Some(1), stateBuckets = Some(nB),
      maintenance = CdcStream.Maintenance(gcEvery = 1, keepVersions = 2,
        optimizeEvery = 2))
    q.awaitTermination()
    // six batches, GC every batch: no bucket holds more than 2
    // marker-complete versions
    (0 until nB).foreach { b =>
      assert(bucketVersions(s"$work/target", b).size <= 2,
        s"bucket $b exceeded keepVersions")
    }
    // the last optimize ran at batch 4 and compacted every latest
    // version to ONE file; batch 5's merge re-fanned only its touched
    // buckets. Un-maintained, 6 batches x shuffle.partitions files per
    // touched bucket would be hundreds — the bound here is O(buckets).
    val files = parquetFiles(new File(s"$work/target"))
    assert(files <= 2 * nB * TestSpark.session.conf
      .get("spark.sql.shuffle.partitions").toInt,
      s"state holds $files parquet files")
    val got = BucketedState.currentView(spark, s"$work/target",
      feed.schema, nB)
    val want = CdcMerge.lastWriteWins(feed, ChangeFeed.keyCols)
    assert(got.collect().map(_.toString).sorted.toSeq ==
      want.collect().map(_.toString).sorted.toSeq)
  }

  test("crash between promote and GC heals on replay") {
    val work = tmp()
    val nB = 4
    val b0 = Seq((1, "a", "I", 1L), (2, "b", "I", 2L), (3, "c", "I", 3L))
      .toDF("k", "v", "_op", "_seq")
    val b1 = Seq((1, "a2", "U", 10L), (4, "d", "I", 11L))
      .toDF("k", "v", "_op", "_seq")
    BucketedState.mergeBatch(b0, 0L, s"$work/t", Seq("k"), nB)
    BucketedState.mergeBatch(b1, 1L, s"$work/t", Seq("k"), nB)
    // crash: batch 1 promoted but maintenance never ran and the
    // checkpoint never committed -> the stream replays batch 1, which
    // re-promotes v=1 from the pre-batch state, then maintenance runs
    BucketedState.mergeBatch(b1, 1L, s"$work/t", Seq("k"), nB)
    CdcStream.Maintenance(gcEvery = 1, keepVersions = 2)
      .run(spark, s"$work/t", 1L, b0.schema, Seq("k"), Some(nB))
    val got = BucketedState.currentView(spark, s"$work/t", b0.schema, nB)
      .as[(Int, String)].collect().toMap
    assert(got == Map(1 -> "a2", 2 -> "b", 3 -> "c", 4 -> "d"))
    (0 until nB).foreach(b =>
      assert(bucketVersions(s"$work/t", b).size <= 2))
  }

  test("maintenance composes with the JDBC serving loop (startToJdbc)") {
    // GC runs AFTER each batch's delta push: the serving table still
    // converges to the batch LWW while the bucketed state stays at
    // <= keepVersions complete versions per bucket
    val work = tmp()
    val nB = 4
    val home = Files.createTempDirectory("graft_maint_derby_").toString
    val url = s"jdbc:derby:$home/maintdb;create=true"
    val opts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val feed = ChangeFeed.full(spark, TestSpark.Sf0001)
    feed.repartition(4).write.parquet(s"$work/changes")
    val q = CdcStream.startToJdbc(spark, s"$work/changes", feed.schema,
      s"$work/target", s"$work/ckpt", ChangeFeed.keyCols,
      url, "maint_t", maxFilesPerTrigger = Some(1),
      stateBuckets = Some(nB), jdbcOptions = opts,
      maintenance = CdcStream.Maintenance(gcEvery = 1, keepVersions = 2))
    q.awaitTermination()
    (0 until nB).foreach(b =>
      assert(bucketVersions(s"$work/target", b).size <= 2))
    val want = BucketedState.currentView(spark, s"$work/target",
      feed.schema, nB)
    val got = graft.sources.SnapshotSource.jdbc(spark, url, "maint_t",
      options = opts)
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("maintenance off (defaults) leaves every version behind") {
    val work = tmp()
    for (i <- 0 until 4)
      CdcStream.mergeBatch(
        Seq((i, s"v$i", "I", i.toLong)).toDF("k", "v", "_op", "_seq"),
        i.toLong, s"$work/t", Seq("k"), false, false)
    assert(flatVersions(s"$work/t").size == 4)
    // and Maintenance() (all knobs 0) is a no-op
    CdcStream.Maintenance().run(spark, s"$work/t", 3L,
      Seq((1, "x", "I", 1L)).toDF("k", "v", "_op", "_seq").schema,
      Seq("k"), None)
    assert(flatVersions(s"$work/t").size == 4)
  }
}
