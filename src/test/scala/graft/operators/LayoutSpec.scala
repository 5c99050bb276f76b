package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def refZ(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((x >> i) & 1L) << (2 * i)) + (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  test("zValue matches the reference bit-interleave") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1023L, 0L), (0L, 1023L),
      (513L, 257L), (1023L, 1023L))
    val got = pts.toDF("x", "y")
      .select($"x", $"y", Layout.zValue($"x", $"y", 10).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == refZ(x, y, 10), s"($x,$y)") }
    // distinct inputs -> distinct z (bijection on the bit range)
    assert(got.map(_._3).distinct.length == pts.length)
  }

  test("z-layout prunes BOTH dimensions; key-sort prunes only its own") {
    // partkey × orderkey — independent dims (suppkey is partkey-derived
    // in TPC-H, which would make a 1-D sort look multi-D)
    val rows = spark.read
      .parquet(s"${TestSpark.Sf0001}/lineitem.parquet")
      .select((col("l_partkey") % 1024).as("x"),
        (col("l_orderkey") % 1024).as("y"))
      .as[(Long, Long)].collect()
    val chunks = 16
    def avgRanges(sorted: Array[(Long, Long)]): (Double, Double) = {
      val per = sorted.grouped(math.ceil(sorted.length / chunks.toDouble)
        .toInt).toSeq
      val rx = per.map(c => (c.map(_._1).max - c.map(_._1).min).toDouble)
      val ry = per.map(c => (c.map(_._2).max - c.map(_._2).min).toDouble)
      (rx.sum / rx.size, ry.sum / ry.size)
    }
    val (xsX, xsY) = avgRanges(rows.sortBy(_._1))         // sort by x
    val (zX, zY) = avgRanges(rows.sortBy(r => refZ(r._1, r._2, 10)))
    // x-sort: near-perfect x pruning, NO y pruning (y ranges ~ domain)
    assert(xsX < 150, s"x-sorted x-range $xsX")
    assert(xsY > 700, s"x-sorted y-range $xsY should be ~unpruned")
    // z-layout: BOTH dimensions pruned well below the 1024 domain
    assert(zX < 600 && zY < 600, s"z ranges ($zX, $zY)")
    // and y improves by a large factor over the single-key layout
    assert(zY < xsY * 0.8, s"zY=$zY vs xsY=$xsY")
  }

  test("zOrderBy preserves rows and clusters by z within partitions") {
    val df = spark.read
      .parquet(s"${TestSpark.Sf0001}/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val laid = Layout.zOrderBy(df, "l_partkey", "l_orderkey", bits = 10,
      partitions = 8)
    assert(laid.count() == df.count())
    assert(laid.columns.toSeq == df.columns.toSeq) // _z dropped
    // within each output partition, z is non-decreasing
    val ok = laid
      .withColumn("_z", Layout.zValue(col("l_partkey"), col("l_orderkey"), 10))
      .withColumn("_pid", spark_partition_id())
      .select("_pid", "_z").as[(Int, Long)]
      .mapPartitions { it =>
        val s = it.toSeq
        Iterator.single(s.map(_._2).sliding(2).forall {
          case Seq(a, b) => a <= b
          case _ => true
        })
      }.collect()
    assert(ok.forall(identity))
  }

  test("skip index: pruned scan equals the exact filter, and skips") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = (0 until 4000).map(i => (i.toLong, i % 97, i % 29))
    val df = rows.toDF("id", "x", "y")
      .withColumn("_blk", Layout.blockOf(
        Layout.zValue(col("x"), col("y"), 7), 6))
    val stats = Layout.minmaxStats(df, "_blk", Seq("x", "y"))
    val surv = Layout.pruneBlocks(stats,
      Seq(("x", lit(10), lit(20)), ("y", lit(3), lit(8))))
    // real skipping happened
    assert(surv.count() < stats.count())
    val got = Layout.prunedScan(df, "_blk", surv)
      .filter(col("x").between(10, 20) && col("y").between(3, 8))
      .select("id").as[Long].collect().toSet
    val want = rows.filter(r => r._2 >= 10 && r._2 <= 20 &&
      r._3 >= 3 && r._3 <= 8).map(_._1).toSet
    assert(got == want) // zero false negatives
  }

  test("skip index: fact side broadcast-semi-joins, never shuffles") {
    import org.apache.spark.sql.functions._
    val df = (0 until 100).map(i => (i.toLong, i % 7)).toDF("id", "x")
      .withColumn("_blk", Layout.blockOf(col("id"), 4))
    val stats = Layout.minmaxStats(df, "_blk", Seq("x"))
    val plan = Layout.prunedScan(df, "_blk",
      Layout.pruneBlocks(stats, Seq(("x", lit(1), lit(2)))))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftSemi"), plan)
  }
}
