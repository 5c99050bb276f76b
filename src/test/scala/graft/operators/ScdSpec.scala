package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  // key 1: insert, update, delete; key 2: insert only; key 3:
  // insert + two updates
  private lazy val feed = Seq(
    (1L, "a1", "I", 10L), (1L, "a2", "U", 30L), (1L, null, "D", 50L),
    (2L, "b1", "I", 20L),
    (3L, "c1", "I", 15L), (3L, "c2", "U", 25L), (3L, "c3", "U", 35L)
  ).toDF("k", "v", "_op", "_seq")

  private lazy val history = Scd.scd2(feed, Seq("k"))

  test("versions, intervals, and current flags are exact") {
    val got = history
      .as[(Long, String, Long, Option[Long], Int)].collect()
      .map(r => (r._1, r._3) -> r).toMap
    assert(got.size == 6) // the D row emits nothing
    assert(got((1L, 10L)) == ((1L, "a1", 10L, Some(30L), 0)))
    assert(got((1L, 30L)) == ((1L, "a2", 30L, Some(50L), 0))) // closed by D
    assert(got((2L, 20L)) == ((2L, "b1", 20L, None, 1)))
    assert(got((3L, 15L)) == ((3L, "c1", 15L, Some(25L), 0)))
    assert(got((3L, 25L)) == ((3L, "c2", 25L, Some(35L), 0)))
    assert(got((3L, 35L)) == ((3L, "c3", 35L, None, 1)))
  }

  test("point-in-time reconstruction equals the LWW state at S") {
    for (s <- Seq(12L, 22L, 32L, 60L)) {
      val asOf = Scd.stateAt(history, lit(s))
        .select("k", "v").as[(Long, String)].collect().toSet
      val lww = CdcMerge.latestByKey(
        feed.filter(col("_seq") <= s), Seq("k"))
        .filter(col("_op") =!= "D")
        .select("k", "v").as[(Long, String)].collect().toSet
      assert(asOf == lww, s"at seq $s")
    }
  }

  test("exactly one current row per live key, zero for deleted keys") {
    val current = history.filter(col("is_current") === 1)
      .select("k").as[Long].collect().toSeq
    assert(current.sorted == Seq(2L, 3L))
  }
}
