package graft.streaming

import java.nio.file.Files

import graft.TestSpark
import graft.operators.{ChangeFeed, CdcMerge}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** ST1-ST7: micro-batching, checkpoint resume, tombstone state. */
class CdcStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_cdcstream_").toString

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("streamed replay equals batch last-write-wins") {
    val work = tmp()
    val feed = ChangeFeed.full(spark, TestSpark.Sf0001)
    feed.repartition(4).write.parquet(s"$work/changes")
    val got = CdcStream.replayToCompletion(spark, s"$work/changes",
      feed.schema, s"$work/target", s"$work/ckpt", ChangeFeed.keyCols,
      maxFilesPerTrigger = Some(1))
    val want = CdcMerge.lastWriteWins(feed, ChangeFeed.keyCols)
    assert(sortedRows(got) == sortedRows(want))
  }

  test("checkpoint resume: second run picks up only new files (ST7)") {
    val work = tmp()
    val feed = ChangeFeed.full(spark, TestSpark.Sf0001)
    // phase 1: inserts only
    ChangeFeed.inserts(spark, TestSpark.Sf0001)
      .write.parquet(s"$work/changes")
    val afterPhase1 = CdcStream.replayToCompletion(spark, s"$work/changes",
      feed.schema, s"$work/target", s"$work/ckpt", ChangeFeed.keyCols)
    assert(afterPhase1.count() ==
      ChangeFeed.orders(spark, TestSpark.Sf0001).count())
    // phase 2: updates + deletes land later; same checkpoint resumes
    ChangeFeed.updates(spark, TestSpark.Sf0001)
      .unionByName(ChangeFeed.deletes(spark, TestSpark.Sf0001))
      .write.mode("append").parquet(s"$work/changes")
    val afterPhase2 = CdcStream.replayToCompletion(spark, s"$work/changes",
      feed.schema, s"$work/target", s"$work/ckpt", ChangeFeed.keyCols)
    val want = CdcMerge.lastWriteWins(feed, ChangeFeed.keyCols)
    assert(sortedRows(afterPhase2) == sortedRows(want))
  }

  test("out-of-order batches: delete arriving before its insert wins by seq") {
    val work = tmp()
    val schema = Seq((1, "v", "I", 0L)).toDF("k", "v", "_op", "_seq").schema
    // run 1: only the DELETE (seq 20) has arrived
    Seq((1, null.asInstanceOf[String], "D", 20L))
      .toDF("k", "v", "_op", "_seq")
      .write.parquet(s"$work/changes")
    CdcStream.replayToCompletion(spark, s"$work/changes", schema,
      s"$work/target", s"$work/ckpt", Seq("k"))
    // run 2: the INSERT (seq 10) arrives late, as a new file
    Seq((1, "stale", "I", 10L)).toDF("k", "v", "_op", "_seq")
      .write.mode("append").parquet(s"$work/changes")
    val finalView = CdcStream.replayToCompletion(spark, s"$work/changes",
      schema, s"$work/target", s"$work/ckpt", Seq("k"))
    // tombstone state: the late insert must NOT resurrect the key
    assert(finalView.count() == 0)
  }

  test("bootstrap: snapshot becomes state v=-1, stream merges on top") {
    val work = tmp()
    val snapshot = Seq((1, "a"), (2, "b")).toDF("k", "v")
    CdcStream.bootstrap(snapshot, s"$work/target")
    val changes = Seq((1, "a2", "U", 10L),
      (2, null.asInstanceOf[String], "D", 11L),
      (3, "c", "I", 12L)).toDF("k", "v", "_op", "_seq")
    changes.write.parquet(s"$work/changes")
    val got = CdcStream.replayToCompletion(spark, s"$work/changes",
      changes.schema, s"$work/target", s"$work/ckpt", Seq("k"))
      .as[(Int, String)].collect().toMap
    assert(got == Map(1 -> "a2", 3 -> "c")) // 2 deleted, snapshot merged
  }

  test("tombstone horizon GC removes expired delete markers from state") {
    val work = tmp()
    val b0 = Seq((1, "a", "I", 1L), (2, "b", "I", 2L))
      .toDF("k", "v", "_op", "_seq")
    CdcStream.mergeBatch(b0, 0L, s"$work/t", Seq("k"), false, false)
    val b1 = Seq((1, null.asInstanceOf[String], "D", 5L))
      .toDF("k", "v", "_op", "_seq")
    CdcStream.mergeBatch(b1, 1L, s"$work/t", Seq("k"), false, false)
    // tombstone present until the horizon passes its seq
    assert(CdcStream.currentState(spark, s"$work/t", b0.schema)
      .count() == 2)
    val b2 = Seq((3, "c", "I", 10L)).toDF("k", "v", "_op", "_seq")
    CdcStream.mergeBatch(b2, 2L, s"$work/t", Seq("k"), false, false,
      tombstoneHorizon = Some(5L))
    val state = CdcStream.currentState(spark, s"$work/t", b0.schema)
    assert(state.count() == 2) // keys 2 and 3; tombstone for 1 gone
    assert(state.filter("_op = 'D'").count() == 0)
  }

  test("gcVersions keeps the newest versions and the view intact") {
    val work = tmp()
    for (i <- 0 until 4) {
      CdcStream.mergeBatch(
        Seq((i, s"v$i", "I", i.toLong)).toDF("k", "v", "_op", "_seq"),
        i.toLong, s"$work/t", Seq("k"), false, false)
    }
    val before = new java.io.File(s"$work/t").listFiles()
      .count(_.getName.startsWith("v="))
    assert(before == 4)
    val removed = CdcStream.gcVersions(spark, s"$work/t", keep = 2)
    assert(removed == 2)
    val schema = Seq((1, "x", "I", 1L)).toDF("k", "v", "_op", "_seq").schema
    assert(CdcStream.currentView(spark, s"$work/t", schema).count() == 4)
  }

  test("batch replay is idempotent: re-merging the same batch id is a no-op") {
    val work = tmp()
    val batch = Seq((1, "a", "I", 1L), (2, "b", "I", 2L))
      .toDF("k", "v", "_op", "_seq")
    CdcStream.mergeBatch(batch, 0L, s"$work/target", Seq("k"),
      ignoreUpdates = false, ignoreDeletes = false)
    val once = sortedRows(CdcStream.currentView(spark, s"$work/target",
      batch.schema))
    CdcStream.mergeBatch(batch, 0L, s"$work/target", Seq("k"),
      ignoreUpdates = false, ignoreDeletes = false)
    val twice = sortedRows(CdcStream.currentView(spark, s"$work/target",
      batch.schema))
    assert(once == twice && once.size == 2)
  }
}
