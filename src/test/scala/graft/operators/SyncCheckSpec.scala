package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class SyncCheckSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def master = Seq(
    (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), // chunk 0
    (4L, "d", 40L), (5L, "e", 50L), // chunk 1
    (8L, "f", 80L) // chunk 2
  ).toDF("pk", "name", "cents")

  private val digestCols =
    Seq(col("pk"), col("name"), col("cents"))

  test("identical tables produce zero mismatched chunks") {
    assert(SyncCheck.mismatchedChunks(master, master, "pk", 2L,
      digestCols).count() == 0)
  }

  test("value drift, missing row, and extra chunk are localized") {
    val replica = Seq(
      (1L, "a", 10L), (2L, "b", 99L), (3L, "c", 30L), // chunk 0: drifted
      (4L, "d", 40L), // chunk 1: row 5 missing
      (8L, "f", 80L), // chunk 2: intact
      (12L, "z", 1L) // chunk 3: replica-only
    ).toDF("pk", "name", "cents")
    val got = SyncCheck.mismatchedChunks(master, replica, "pk", 2L,
      digestCols)
      .select(col("chunk_id"), col("n_master"), col("n_replica"))
      .as[(Long, Long, Long)].collect().toSet
    // chunk ids at size 2: pk div 2 → 0:{1}... actually {0,1}→0, {2,3}→1,
    // {4,5}→2, {8}→4, {12}→6
    assert(got == Set(
      (1L, 2L, 2L), // pk 2 drifted: counts equal, digest differs
      (2L, 2L, 1L), // pk 5 missing
      (6L, 0L, 1L))) // replica-only chunk
    // the intact chunks (0: pk 1, 4: pk 8) must NOT appear
  }

  test("digest is order- and partitioning-independent") {
    val shuffled = master.orderBy(col("name").desc).repartition(7)
    assert(SyncCheck.mismatchedChunks(master, shuffled, "pk", 2L,
      digestCols).count() == 0)
  }

  test("digest covers every listed column") {
    val renamedOnly = master.withColumn("name",
      when(col("pk") === 3L, lit("C")).otherwise(col("name")))
    val got = SyncCheck.mismatchedChunks(master, renamedOnly, "pk", 2L,
      digestCols).select(col("chunk_id")).as[Long].collect().toSeq
    assert(got == Seq(1L)) // pk 3 lives in chunk 1
  }
}
