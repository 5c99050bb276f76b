package graft.sources

import java.nio.file.Files
import java.sql.DriverManager

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exercises the JDBC snapshot path (S1, reference mysqldump bootstrap
  * river/river.go:111-145) against an embedded Derby database — the one
  * JDBC engine already on Spark's classpath — so the range-partitioned
  * read and filter pushdown are spec-proven instead of carried as
  * "environment-bound, untested".
  */
class SnapshotSourceJdbcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  private lazy val url: String = {
    val home = Files.createTempDirectory("graft_derby_").toString
    // keep derby.log out of the repo root
    System.setProperty("derby.system.home", home)
    val u = s"jdbc:derby:$home/snapdb;create=true"
    val conn = DriverManager.getConnection(u)
    try {
      val st = conn.createStatement()
      st.execute(
        "CREATE TABLE snap_t (id INT NOT NULL PRIMARY KEY, " +
          "name VARCHAR(32) NOT NULL, val DOUBLE NOT NULL)")
      val ps = conn.prepareStatement("INSERT INTO snap_t VALUES (?, ?, ?)")
      (1 to 100).foreach { i =>
        ps.setInt(1, i); ps.setString(2, s"row_$i"); ps.setDouble(3, i * 1.5)
        ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()
    u
  }

  private def read(partitioned: Boolean) = SnapshotSource.jdbc(
    spark, url, "snap_t",
    partitionColumn = if (partitioned) Some("id") else None,
    lowerBound = 1L, upperBound = 101L, numPartitions = 4,
    options = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))

  test("range-partitioned JDBC snapshot reads every row in parallel") {
    val df = read(partitioned = true)
    assert(df.count() == 100)
    // the partition column option must turn into 4 real range splits,
    // each holding its contiguous id slice — the parallel analog of
    // the reference's single mysqldump connection
    assert(df.rdd.getNumPartitions == 4)
    val perPart = df.select("id").rdd
      .mapPartitions(it => Iterator.single(it.size)).collect().toSeq
    assert(perPart.forall(_ > 0), s"empty range split: $perPart")
    assert(perPart.sum == 100)
    // values survive the round-trip
    val r42 = df.filter(col("id") === 42).collect()
    assert(r42.length == 1)
    assert(r42.head.getAs[String]("NAME") == "row_42")
    assert(r42.head.getAs[Double]("VAL") == 63.0)
  }

  test("filters push down to the database, not post-scan") {
    val df = read(partitioned = false).filter(col("id") <= 10)
    val scan = df.queryExecution.executedPlan.toString
    // the JDBC scan node advertises the pushed predicate — the filter
    // runs IN the database; Spark never sees the other 90 rows
    assert(scan.contains("PushedFilters"), scan)
    assert("PushedFilters: \\[[^\\]]*LessThanOrEqual\\(".r
      .findFirstIn(scan).isDefined, scan)
    assert(df.count() == 10)
  }
}
