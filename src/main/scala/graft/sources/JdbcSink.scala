package graft.sources

import java.sql.{Connection, DriverManager, PreparedStatement}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.jdbc.JdbcDialects

/** JDBC batch sink — the reference's database-write side (S6-S8): a
  * prepared `INSERT INTO t (cols) VALUES (?…)` loop inside one
  * transaction per flush (clickhouse/client.go:129-230). Spark's JDBC
  * writer is the distributed analog: each partition opens one
  * connection and flushes prepared-statement batches of `batchSize`
  * rows, so a 1000-partition write is 1000 parallel bulk loaders where
  * the reference had one.
  *
  * Mutations (the reference's per-row `ALTER TABLE … UPDATE/DELETE`,
  * clickhouse/client.go:249-335) don't map to a sane distributed
  * per-row statement loop; the engine's CDC path instead maintains the
  * collapsed last-write-wins state (CdcMerge/CdcStream) and REPLACES
  * the sink table with it — the ReplacingMergeTree posture: the sink
  * always holds the collapsed view, and replace is idempotent where a
  * mutation replay is not.
  */
object JdbcSink {

  /** Append `df` to a JDBC table (created if absent) — the S6
    * batch-insert path. */
  def append(df: DataFrame, url: String, table: String,
      batchSize: Int = 1000,
      options: Map[String, String] = Map.empty): Unit =
    writer(df, batchSize, options)
      .option("url", url).option("dbtable", table)
      .mode("append").save()

  /** Replace the sink table's contents with `df` — the bootstrap /
    * repair path: write the full CDC-collapsed state. NOT atomic for
    * concurrent readers: Spark's JDBC overwrite truncates (or
    * drops+creates) and then inserts partition-parallel transactions,
    * so a reader mid-replace can observe an empty or partial table.
    * Use it to seed or repair a sink, and [[upsertKeys]] for the
    * per-batch continuous push (which touches only the batch's keys).
    * `truncate = true` keeps the existing table definition (and any
    * grants/indexes) instead of drop+create when the schema is
    * unchanged. */
  def replace(df: DataFrame, url: String, table: String,
      batchSize: Int = 1000, truncate: Boolean = false,
      options: Map[String, String] = Map.empty): Unit =
    writer(df, batchSize, options)
      .option("url", url).option("dbtable", table)
      .option("truncate", truncate.toString)
      .mode("overwrite").save()

  /** Whether `table` exists at `url` — drives the bootstrap-vs-delta
    * choice in [[graft.streaming.CdcStream.startToJdbc]]. One
    * driver-side metadata probe (`SELECT * … WHERE 1=0`), no scan. */
  def tableExists(url: String, table: String,
      options: Map[String, String] = Map.empty): Boolean = {
    val conn = connect(url, options)
    try {
      val st = conn.createStatement()
      try { st.executeQuery(s"SELECT * FROM $table WHERE 1=0"); true }
      finally st.close()
    } catch { case _: java.sql.SQLException => false }
    finally conn.close()
  }

  /** Per-batch delta push: make the sink table agree with the CDC state
    * on exactly `batchKeys` — `DELETE` every batch key's rows, then
    * insert `currentRows` (the post-merge live rows for those keys; a
    * key with no current row was deleted upstream and gets only the
    * DELETE). Work and database writes are O(batch), not O(state) —
    * the reference's own delta posture (per-key mutations,
    * clickhouse/client.go:249-335) as set-oriented statements instead
    * of its per-row ALTERs.
    *
    * Each partition runs its deletes and inserts on ONE connection in
    * ONE transaction (commit at partition end, rollback on failure), so
    * a reader never sees a key's delete without its re-insert. Replay
    * after a crash is idempotent: delete-by-key clears whatever a
    * partial attempt left before re-inserting the same rows.
    *
    * The table must already exist (Spark's writer creates it on the
    * bootstrap [[replace]]); `batchKeys` must be small relative to the
    * state — it is collected per partition into prepared-statement
    * batches, never joined database-side.
    */
  def upsertKeys(batchKeys: DataFrame, currentRows: DataFrame,
      keyCols: Seq[String], url: String, table: String,
      batchSize: Int = 1000,
      options: Map[String, String] = Map.empty): Unit = {
    require(batchSize > 0, "JdbcSink: batchSize must be positive")
    require(keyCols.nonEmpty, "JdbcSink.upsertKeys: keyCols empty")
    val payloadCols = currentRows.columns.toSeq
    require(keyCols.forall(payloadCols.contains),
      s"key cols $keyCols not all in payload $payloadCols")
    val quote = JdbcDialects.get(url).quoteIdentifier _
    val deleteSql = s"DELETE FROM $table WHERE " +
      keyCols.map(k => s"${quote(k)} = ?").mkString(" AND ")
    val insertSql = s"INSERT INTO $table (" +
      payloadCols.map(quote).mkString(", ") + ") VALUES (" +
      payloadCols.map(_ => "?").mkString(", ") + ")"
    // one frame so delete+insert for a key land in the same partition /
    // transaction: batch keys left-joined to their current live rows
    // (null `_live` = delete-only key), co-partitioned by key
    val joined = batchKeys
      .join(currentRows.withColumn("_live", lit(true)), keyCols, "left")
    val schema = joined.schema
    val keyIdx = keyCols.map(schema.fieldIndex)
    val payloadIdx = payloadCols.map(schema.fieldIndex)
    val liveIdx = schema.fieldIndex("_live")
    joined.repartition(keyCols.map(col): _*).foreachPartition {
      (rows: Iterator[Row]) =>
        if (rows.nonEmpty) {
          val conn = connect(url, options)
          try {
            conn.setAutoCommit(false)
            val buffered = rows.toVector
            runBatched(conn, deleteSql, buffered, keyIdx, batchSize)
            runBatched(conn, insertSql,
              buffered.filter(r => !r.isNullAt(liveIdx)),
              payloadIdx, batchSize)
            conn.commit()
          } catch {
            case e: Throwable =>
              try conn.rollback() catch { case _: Throwable => () }
              throw e
          } finally conn.close()
        }
    }
  }

  private def connect(url: String,
      options: Map[String, String]): Connection = {
    options.get("driver").foreach(Class.forName)
    val props = new java.util.Properties()
    options.foreach { case (k, v) =>
      if (k != "driver") props.setProperty(k, v)
    }
    DriverManager.getConnection(url, props)
  }

  /** Execute `sql` once per row with the given field positions bound as
    * parameters, in prepared-statement batches of `batchSize`. */
  private def runBatched(conn: Connection, sql: String,
      rows: Seq[Row], fieldIdx: Seq[Int], batchSize: Int): Unit = {
    if (rows.nonEmpty) {
      val ps = conn.prepareStatement(sql)
      try {
        // parameter SQL types, for null binds (setObject(i, null) is
        // driver-dependent; setNull with the declared type is not)
        val sqlTypes =
          try {
            val pmd = ps.getParameterMetaData
            (1 to fieldIdx.size).map(pmd.getParameterType)
          } catch {
            case _: java.sql.SQLException =>
              fieldIdx.map(_ => java.sql.Types.NULL)
          }
        var pending = 0
        rows.foreach { row =>
          fieldIdx.zipWithIndex.foreach { case (fi, i) =>
            if (row.isNullAt(fi)) ps.setNull(i + 1, sqlTypes(i))
            else ps.setObject(i + 1, row.get(fi))
          }
          ps.addBatch()
          pending += 1
          if (pending >= batchSize) { ps.executeBatch(); pending = 0 }
        }
        if (pending > 0) { ps.executeBatch(); () }
      } finally ps.close()
    }
  }

  private def writer(df: DataFrame, batchSize: Int,
      options: Map[String, String]) = {
    require(batchSize > 0, "JdbcSink: batchSize must be positive")
    var w = df.write.format("jdbc")
      .option("batchsize", batchSize)
    options.foreach { case (k, v) => w = w.option(k, v) }
    w
  }
}
