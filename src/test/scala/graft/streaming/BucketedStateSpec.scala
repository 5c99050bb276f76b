package graft.streaming

import java.nio.file.Files

import graft.TestSpark
import graft.operators.{ChangeFeed, CdcMerge}
import org.scalatest.funsuite.AnyFunSuite

class BucketedStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private val N = 8

  test("bucketed streamed replay equals batch last-write-wins") {
    val work = Files.createTempDirectory("graft_bstate_").toString
    val feed = ChangeFeed.full(spark, TestSpark.Sf0001)
    feed.repartition(3).write.parquet(s"$work/changes")
    val q = CdcStream.start(spark, s"$work/changes", feed.schema,
      s"$work/target", s"$work/ckpt", ChangeFeed.keyCols,
      maxFilesPerTrigger = Some(1), stateBuckets = Some(N))
    q.awaitTermination()
    val got = BucketedState.currentView(spark, s"$work/target",
      feed.schema, N)
    val want = CdcMerge.lastWriteWins(feed, ChangeFeed.keyCols)
    assert(got.collect().map(_.toString).sorted.toSeq ==
      want.collect().map(_.toString).sorted.toSeq)
  }

  test("a one-key batch rewrites exactly one bucket") {
    val work = Files.createTempDirectory("graft_bstate2_").toString
    val b0 = Seq((1, "a", "I", 1L), (2, "b", "I", 2L), (3, "c", "I", 3L),
      (17, "q", "I", 4L)).toDF("k", "v", "_op", "_seq")
    BucketedState.mergeBatch(b0, 0L, s"$work/t", Seq("k"), N)
    def versions(b: Int): Set[String] = {
      val d = new java.io.File(s"$work/t/bucket=$b")
      if (!d.exists()) Set.empty
      else d.listFiles().filter(_.getName.startsWith("v="))
        .map(_.getName).toSet
    }
    val bucketsAfter0 = (0 until N).filter(versions(_).nonEmpty)
    // batch 1 touches only key 1
    val b1 = Seq((1, "a2", "U", 10L)).toDF("k", "v", "_op", "_seq")
    BucketedState.mergeBatch(b1, 1L, s"$work/t", Seq("k"), N)
    val gained = (0 until N).filter(b => versions(b).contains("v=1"))
    assert(gained.size == 1, s"exactly one bucket gains v=1, got $gained")
    // untouched buckets still only have v=0
    bucketsAfter0.filterNot(gained.contains).foreach(b =>
      assert(versions(b) == Set("v=0")))
    val view = BucketedState.currentView(spark, s"$work/t",
      b0.schema, N).as[(Int, String)].collect().toMap
    assert(view == Map(1 -> "a2", 2 -> "b", 3 -> "c", 17 -> "q"))
  }

  test("per-bucket gcVersions bounds storage, view unchanged") {
    val work = Files.createTempDirectory("graft_bgc_").toString
    // key 1 updated three times -> its bucket accrues 3 versions
    for (i <- 0 until 3) {
      BucketedState.mergeBatch(
        Seq((1, s"v$i", if (i == 0) "I" else "U", i.toLong))
          .toDF("k", "v", "_op", "_seq"),
        i.toLong, s"$work/t", Seq("k"), N)
    }
    val removed = BucketedState.gcVersions(spark, s"$work/t", N, keep = 1)
    assert(removed == 2)
    val schema = Seq((1, "x", "I", 1L)).toDF("k", "v", "_op", "_seq").schema
    val view = BucketedState.currentView(spark, s"$work/t", schema, N)
      .as[(Int, String)].collect().toMap
    assert(view == Map(1 -> "v2"))
  }

  test("gcVersions never deletes the newest marker-complete version") {
    val work = Files.createTempDirectory("graft_bgc2_").toString
    for (i <- 0 until 2) {
      BucketedState.mergeBatch(
        Seq((1, s"v$i", if (i == 0) "I" else "U", i.toLong))
          .toDF("k", "v", "_op", "_seq"),
        i.toLong, s"$work/t", Seq("k"), N)
    }
    // find key 1's bucket; fake two crash artifacts:
    val bucketDir = new java.io.File(s"$work/t").listFiles()
      .filter(_.getName.startsWith("bucket="))
      .find(_.listFiles().nonEmpty).get
    // (a) v=0 loses its marker — crash between rename and marker: garbage
    assert(new java.io.File(bucketDir, "v=0/_GRAFT_OK").delete())
    // (b) unmarked v=5 NEWER than every complete version — possibly a
    //     live writer mid-promotion: must be left alone
    assert(new java.io.File(bucketDir, "v=5").mkdir())
    val removed = BucketedState.gcVersions(spark, s"$work/t", N, keep = 1)
    // old unmarked v=0 deleted as garbage; v=1 (newest complete) and
    // v=5 (possible in-flight) retained — before the fix, keep=1 counted
    // v=5 as the kept version and deleted marker-complete v=1
    assert(removed == 1)
    val names = bucketDir.listFiles().map(_.getName).toSet
    assert(names.contains("v=1") && names.contains("v=5"))
    assert(!names.contains("v=0"))
    val schema = Seq((1, "x", "I", 1L)).toDF("k", "v", "_op", "_seq").schema
    val view = BucketedState.currentView(spark, s"$work/t", schema, N)
      .as[(Int, String)].collect().toMap
    assert(view == Map(1 -> "v1")) // readers still see the newest complete
  }

  test("optimize compacts to one file per bucket, view unchanged") {
    val work = Files.createTempDirectory("graft_bopt_").toString
    val nB = 4
    // 6 batches over many keys: every batch rewrites most buckets with
    // one file per shuffle partition -> many small files accrue
    for (i <- 0 until 6) {
      val rows = (0 until 40).map(k =>
        (k, s"v$i-$k", if (i == 0) "I" else "U", (i * 100 + k).toLong))
      BucketedState.mergeBatch(
        rows.toDF("k", "v", "_op", "_seq").repartition(4),
        i.toLong, s"$work/t", Seq("k"), nB)
    }
    val schema = Seq((1, "x", "I", 1L)).toDF("k", "v", "_op", "_seq").schema
    def parquetFiles(): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else Seq(f).filter(_.getName.endsWith(".parquet"))
      walk(new java.io.File(s"$work/t"))
    }
    val before = BucketedState.currentView(spark, s"$work/t", schema, nB)
      .as[(Int, String)].collect().toSet
    assert(parquetFiles().size > nB) // the problem exists
    BucketedState.optimize(spark, s"$work/t", schema, nB, Seq("k"),
      keepVersions = 1)
    // one data file per bucket remains
    assert(parquetFiles().size <= nB, parquetFiles().map(_.getPath))
    val after = BucketedState.currentView(spark, s"$work/t", schema, nB)
      .as[(Int, String)].collect().toSet
    assert(after == before)
    // the NEXT batch (and its crash-replay) still merges correctly
    val b6 = Seq((1, "final", "U", 900L)).toDF("k", "v", "_op", "_seq")
    BucketedState.mergeBatch(b6, 6L, s"$work/t", Seq("k"), nB)
    BucketedState.mergeBatch(b6, 6L, s"$work/t", Seq("k"), nB) // replay
    val end = BucketedState.currentView(spark, s"$work/t", schema, nB)
      .as[(Int, String)].collect().toMap
    assert(end(1) == "final" && end.size == before.size)
  }

  test("optimize drops expired tombstones and keeps replay-safe versions") {
    val work = Files.createTempDirectory("graft_bopt2_").toString
    val nB = 4
    BucketedState.mergeBatch(
      Seq((1, "a", "I", 1L), (2, "b", "I", 2L)).toDF("k", "v", "_op", "_seq"),
      0L, s"$work/t", Seq("k"), nB)
    BucketedState.mergeBatch(
      Seq((1, null.asInstanceOf[String], "D", 10L))
        .toDF("k", "v", "_op", "_seq"),
      1L, s"$work/t", Seq("k"), nB)
    val schema = Seq((1, "x", "I", 1L)).toDF("k", "v", "_op", "_seq").schema
    def stateRows() = BucketedState.currentState(spark, s"$work/t",
      schema, nB).count()
    assert(stateRows() == 2) // live row + tombstone
    // default keepVersions=2: the pre-batch version survives for replay
    BucketedState.optimize(spark, s"$work/t", schema, nB, Seq("k"),
      tombstoneHorizon = Some(10L))
    assert(stateRows() == 1) // tombstone compacted away
    val view = BucketedState.currentView(spark, s"$work/t", schema, nB)
      .as[(Int, String)].collect().toSet
    assert(view == Set((2, "b")))
    // key 1's bucket still holds its pre-batch version for a replay of
    // batch 1 (keepVersions=2)
    val replayState = BucketedState.readBuckets(spark, s"$work/t", schema,
      0 until nB, beforeBatch = Some(1L))
    assert(replayState.count() == 2) // both inserts from batch 0
  }

  test("optimize recovers a crashed swap from the trash copy") {
    val work = Files.createTempDirectory("graft_bopt3_").toString
    val nB = 2
    BucketedState.mergeBatch(
      Seq((1, "a", "I", 1L)).toDF("k", "v", "_op", "_seq"),
      0L, s"$work/t", Seq("k"), nB)
    val schema = Seq((1, "x", "I", 1L)).toDF("k", "v", "_op", "_seq").schema
    // simulate a crash between rename-to-trash and rename-in: the
    // version dir is gone, only the trash copy holds the data
    val bucketDir = new java.io.File(s"$work/t").listFiles()
      .filter(_.getName.startsWith("bucket="))
      .find(d => new java.io.File(d, "v=0").exists()).get
    val v0 = new java.io.File(bucketDir, "v=0")
    assert(v0.renameTo(new java.io.File(bucketDir, "trash-v=0")))
    assert(BucketedState.currentView(spark, s"$work/t", schema, nB)
      .count() == 0) // reader sees nothing mid-crash
    BucketedState.optimize(spark, s"$work/t", schema, nB, Seq("k"))
    val view = BucketedState.currentView(spark, s"$work/t", schema, nB)
      .as[(Int, String)].collect().toSet
    assert(view == Set((1, "a"))) // restored, then compacted normally
  }

  test("re-merging the same batch id is idempotent") {
    val work = Files.createTempDirectory("graft_bstate3_").toString
    val b0 = Seq((1, "a", "I", 1L), (2, "b", "I", 2L))
      .toDF("k", "v", "_op", "_seq")
    BucketedState.mergeBatch(b0, 0L, s"$work/t", Seq("k"), N)
    val b1 = Seq((1, null.asInstanceOf[String], "D", 9L))
      .toDF("k", "v", "_op", "_seq")
    BucketedState.mergeBatch(b1, 1L, s"$work/t", Seq("k"), N)
    val once = BucketedState.currentView(spark, s"$work/t", b0.schema, N)
      .as[(Int, String)].collect().toSet
    BucketedState.mergeBatch(b1, 1L, s"$work/t", Seq("k"), N) // replay
    val twice = BucketedState.currentView(spark, s"$work/t", b0.schema, N)
      .as[(Int, String)].collect().toSet
    assert(once == twice && once == Set((2, "b")))
  }
}
