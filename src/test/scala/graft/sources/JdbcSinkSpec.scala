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
    // maxFilesPerTrigger=2 forces multiple micro-batches: batch 0
    // bootstraps the table via replace, every later batch goes through
    // the O(batch) upsertKeys delta path
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
    // …and equals what the full-replace repair path would have written
    JdbcSink.replace(want, url, "cdc_full", options = driverOpt)
    val full = readBack("cdc_full")
    assert(got.exceptAll(full).isEmpty && full.exceptAll(got).isEmpty)
  }

  test("bucketed-state startToJdbc lands the same LWW table, O(batch) reads") {
    import graft.operators.ChangeFeed
    import graft.streaming.{BucketedState, CdcStream}
    val work = Files.createTempDirectory("graft_jsinkb_").toString
    val feed = ChangeFeed.full(spark, TestSpark.Sf0001)
    feed.write.parquet(s"$work/changes")
    // partition-scoped state: merge rewrites only touched buckets and
    // the delta lookup reads only those buckets back (viewForKeys)
    val q = CdcStream.startToJdbc(spark, s"$work/changes", feed.schema,
      s"$work/target", s"$work/ckpt", ChangeFeed.keyCols,
      url, "cdc_live_b", maxFilesPerTrigger = Some(2),
      jdbcOptions = driverOpt, stateBuckets = Some(8))
    q.awaitTermination()
    val want = BucketedState.currentView(spark, s"$work/target",
      feed.schema, 8)
    val got = readBack("cdc_live_b")
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("upsertKeys touches only the batch's keys; crash replay idempotent") {
    val state0 = Seq((1, "a"), (2, "b"), (3, "c")).toDF("K", "V")
    JdbcSink.replace(state0, url, "delta_t", options = driverOpt)
    // batch touches K=2 (update), K=3 (delete-only: no current row),
    // K=4 (insert); K=1 is untouched and must survive verbatim
    val keys = Seq(2, 3, 4).toDF("K")
    val current = Seq((2, "b2"), (4, "d")).toDF("K", "V")
    JdbcSink.upsertKeys(keys, current, Seq("K"), url, "delta_t",
      options = driverOpt)
    def state = readBack("delta_t").as[(Int, String)].collect().toMap
    assert(state == Map(1 -> "a", 2 -> "b2", 4 -> "d"))
    // replaying the same batch after a crash leaves the table identical
    // (delete-by-key clears whatever a partial attempt left)
    JdbcSink.upsertKeys(keys, current, Seq("K"), url, "delta_t",
      options = driverOpt)
    assert(state == Map(1 -> "a", 2 -> "b2", 4 -> "d"))
    // null payload values round-trip (setNull with declared SQL type)
    JdbcSink.upsertKeys(Seq(5).toDF("K"),
      Seq((5, null.asInstanceOf[String])).toDF("K", "V"), Seq("K"),
      url, "delta_t", options = driverOpt)
    assert(readBack("delta_t").filter($"K" === 5)
      .select($"V").collect().map(_.isNullAt(0)).toSeq == Seq(true))
  }

  test("append fans out one database connection per Spark partition") {
    CountingDriver.registered
    val curl = url.replace("jdbc:derby:", CountingDriver.Prefix + "derby:")
    // numeric columns only: the counting URL prefix hides the db from
    // Spark's DerbyDialect, and the generic dialect's string mapping
    // (TEXT) is not a Derby type
    val rows = spark.range(8).toDF("K").withColumn("V", $"K" * 2)
    def run(parts: Int, table: String): Int = {
      val before = CountingDriver.connects.get
      JdbcSink.append(rows.repartition(parts), curl, table)
      CountingDriver.connects.get - before
    }
    // driver-side overhead (schema probe, CREATE TABLE) is identical
    // between the runs, so the delta isolates the per-partition fan-out
    val c1 = run(1, "cpp_t1")
    val c4 = run(4, "cpp_t4")
    assert(c4 - c1 == 3,
      s"expected exactly one extra connection per extra partition " +
        s"(1-part run: $c1, 4-part run: $c4)")
    assert(readBack("cpp_t4").count() == 8)
  }

  test("tableExists: missing table is false; other SQL errors propagate") {
    assert(!JdbcSink.tableExists(url, "definitely_absent_t", driverOpt))
    // a non-missing-table failure (here: a syntax error standing in for
    // a timeout/auth/connection blip) must RETHROW — mapping it to
    // false would send startToJdbc down the full-replace bootstrap path
    // against a live table (ADVICE r9)
    intercept[java.sql.SQLException] {
      JdbcSink.tableExists(url, "not a valid identifier!!", driverOpt)
    }
  }

  test("atomic replace: a concurrent reader only ever sees old or new") {
    val aRows = Seq((1, "a1"), (2, "a2"), (3, "a3"))
    val bRows = Seq((10, "b1"), (20, "b2"))
    val a = aRows.toDF("K", "V")
    val b = bRows.toDF("K", "V")
    JdbcSink.replace(a, url, "atomic_t", options = driverOpt) // creates
    val aSet = aRows.toSet
    val bSet = bRows.toSet
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val polls = new java.util.concurrent.atomic.AtomicInteger(0)
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val reader = new Thread(() => {
      val conn = java.sql.DriverManager.getConnection(url)
      // Derby is lock-based: at READ COMMITTED a scan releases row
      // locks as it goes, so a DML-swap commit mid-scan can interleave
      // old and new rows (and REPEATABLE READ still admits the fresh
      // inserts as phantoms) — that is the engine's isolation contract,
      // not the sink's swap. SERIALIZABLE is the Derby level that makes
      // a single SELECT statement-consistent, i.e. the equivalent of
      // the statement snapshot MVCC engines give every reader for free
      // (see JdbcSink.replace's isolation fine print).
      conn.setTransactionIsolation(
        java.sql.Connection.TRANSACTION_SERIALIZABLE)
      try {
        while (!stop.get) {
          try {
            val st = conn.createStatement()
            try {
              val rs = st.executeQuery("SELECT K, V FROM atomic_t")
              val got = scala.collection.mutable.Set.empty[(Int, String)]
              while (rs.next()) got += (rs.getInt(1) -> rs.getString(2))
              rs.close()
              polls.incrementAndGet()
              if (got.toSet != aSet && got.toSet != bSet)
                bad.add(s"partial state observed: ${got.toSet}")
            } finally st.close()
          } catch {
            case e: java.sql.SQLException =>
              bad.add("reader error: " + e.getMessage)
          }
        }
      } finally conn.close()
    })
    reader.start()
    try {
      // both swap strategies under the polling reader: rename swap
      // (truncate=false, Derby transactional DDL) and the
      // definition-preserving DML swap (truncate=true)
      for (_ <- 1 to 3) {
        JdbcSink.replace(b, url, "atomic_t", options = driverOpt)
        JdbcSink.replace(a, url, "atomic_t", truncate = true,
          options = driverOpt)
      }
      JdbcSink.replace(b, url, "atomic_t", options = driverOpt)
    } finally { stop.set(true); reader.join() }
    assert(bad.isEmpty, s"reader observations: $bad")
    assert(polls.get > 0, "reader never completed a poll")
    assert(readBack("atomic_t").as[(Int, String)].collect().toSet == bSet)
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

  test("replace survives a schema change (the repair-after-ALTER path)") {
    // the definition-preserving DML swap can't represent a frame whose
    // columns drifted from the existing table — replace must fall back
    // (rename swap on Derby; documented non-atomic recreate elsewhere)
    // instead of failing the repair forever
    JdbcSink.replace(Seq((1, "a")).toDF("K", "V"), url, "evolve_t",
      options = driverOpt)
    val widened = Seq((1, "a2", 7L), (2, "b", 8L)).toDF("K", "V", "W")
    JdbcSink.replace(widened, url, "evolve_t", truncate = true,
      options = driverOpt)
    assert(readBack("evolve_t").columns.toSet == Set("K", "V", "W"))
    assert(readBack("evolve_t").as[(Int, String, Long)].collect().toSet ==
      Set((1, "a2", 7L), (2, "b", 8L)))
    // and a narrowing change too (rename-unsupported dialects take the
    // non-atomic recreate; Derby takes the rename swap)
    JdbcSink.replace(Seq((5, "x")).toDF("K", "V"), url, "evolve_t",
      options = driverOpt)
    assert(readBack("evolve_t").as[(Int, String)].collect().toSet ==
      Set((5, "x")))
  }
}
