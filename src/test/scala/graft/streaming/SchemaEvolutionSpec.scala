package graft.streaming

import java.nio.file.Files

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** ST6: DDL mid-stream — the reference refreshes TableInfo on
  * OnTableChanged and subsequent events carry the new column set
  * (river/sync.go:54-65, exercised by the stale suite at
  * river/river_test.go:385-399). Here: the stream restarts with the
  * refreshed schema (same checkpoint), and the versioned state absorbs
  * added/dropped columns on read. */
class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

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
}
