package graft.sources

import java.nio.file.Files

import graft.TestSpark
import graft.operators.CdcMerge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end CDC → real database: the change feed collapses through
  * CdcMerge and lands in an embedded Derby table via JdbcSink; reading
  * it back through SnapshotSource.jdbc must return exactly the
  * last-write-wins state. This is the reference's full loop (binlog →
  * rules → ClickHouse table) with both database endpoints real. */
class JdbcSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private val driverOpt =
    Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  private lazy val url: String = {
    val home = Files.createTempDirectory("graft_derby_sink_").toString
    System.setProperty("derby.system.home", home)
    s"jdbc:derby:$home/sinkdb;create=true"
  }

  private def readBack(table: String) =
    SnapshotSource.jdbc(spark, url, table, options = driverOpt)

  test("append twice accumulates rows (S6 batch-insert semantics)") {
    val rows = Seq((1, "a"), (2, "b")).toDF("K", "V")
    JdbcSink.append(rows, url, "ins_t", options = driverOpt)
    JdbcSink.append(rows, url, "ins_t", options = driverOpt)
    assert(readBack("ins_t").count() == 4)
  }

  test("streaming CDC replay lands the LWW state in the database") {
    import graft.operators.ChangeFeed
    import graft.streaming.CdcStream
    val work = Files.createTempDirectory("graft_jsink_").toString
    val feed = ChangeFeed.full(spark, TestSpark.Sf0001)
    feed.write.parquet(s"$work/changes")
    val q = CdcStream.startToJdbc(spark, s"$work/changes", feed.schema,
      s"$work/target", s"$work/ckpt", ChangeFeed.keyCols,
      url, "cdc_live", maxFilesPerTrigger = Some(2),
      jdbcOptions = driverOpt)
    q.awaitTermination()
    // the database table equals the batch-replay LWW view, row for row
    val want = CdcStream.currentView(spark, s"$work/target", feed.schema)
    val got = readBack("cdc_live")
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("CDC merge state replaces the sink table; re-apply idempotent") {
    val target = Seq((1, "a"), (2, "b"), (3, "c")).toDF("K", "V")
    val changes = Seq(
      (1, "a2", "U", 10L), (2, null.asInstanceOf[String], "D", 11L),
      (4, "d", "I", 12L)).toDF("K", "V", "_op", "_seq")
    val merged = CdcMerge.applyChanges(target, changes, Seq("K"))
    JdbcSink.replace(merged, url, "state_t", options = driverOpt)
    def state = readBack("state_t").as[(Int, String)].collect().toMap
    assert(state == Map(1 -> "a2", 3 -> "c", 4 -> "d"))
    // replace is idempotent — reapplying the same state is a no-op
    JdbcSink.replace(merged, url, "state_t", options = driverOpt)
    assert(state == Map(1 -> "a2", 3 -> "c", 4 -> "d"))
    // truncate-mode replace keeps the table definition and still swaps
    // the contents
    JdbcSink.replace(merged.filter(col("K") =!= 3), url, "state_t",
      truncate = true, options = driverOpt)
    assert(state == Map(1 -> "a2", 4 -> "d"))
  }
}
