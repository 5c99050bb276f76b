package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SnapshotDiffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private lazy val cur = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0),
    (5L, null.asInstanceOf[String], 50.0)
  ).toDF("k", "s", "v")

  // target: 1 unchanged, 2 value-changed, 3 deleted, 5 null→value,
  // 6 inserted
  private lazy val tgt = Seq(
    (1L, "a", 10.0), (2L, "b", 25.0), (4L, "d", 40.0), (5L, "e", 50.0),
    (6L, "f", 60.0)
  ).toDF("k", "s", "v")

  test("diff classifies I/U/D, skips identical, handles NULL payloads") {
    val got = SnapshotDiff.diff(cur, tgt, Seq("k"))
      .as[(String, Long, Option[String], Option[Double])].collect()
      .map(r => r._2 -> r).toMap
    assert(got.keySet == Set(2L, 3L, 5L, 6L))
    assert(got(2L) == (("U", 2L, Some("b"), Some(25.0))))
    assert(got(3L) == (("D", 3L, None, None)))
    assert(got(5L) == (("U", 5L, Some("e"), Some(50.0)))) // NULL→value
    assert(got(6L) == (("I", 6L, Some("f"), Some(60.0))))
  }

  test("round trip: applying the diff to current reproduces target") {
    val changes = SnapshotDiff.diff(cur, tgt, Seq("k"))
      .withColumnRenamed("_op", "_op")
      .withColumn("_seq", lit(1L))
    val applied = CdcMerge.applyChanges(cur, changes, Seq("k"))
    val a = applied.as[(Long, Option[String], Option[Double])]
      .collect().toSet
    val want = tgt.as[(Long, Option[String], Option[Double])]
      .collect().toSet
    assert(a == want)
  }

  test("diff of identical snapshots is empty") {
    assert(SnapshotDiff.diff(cur, cur, Seq("k")).count() == 0)
  }

  test("schema mismatch is rejected") {
    val ex = intercept[IllegalArgumentException] {
      SnapshotDiff.diff(cur, tgt.drop("v"), Seq("k"))
    }
    assert(ex.getMessage.contains("schemas differ"))
  }
}
