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
    * repair path: write the full CDC-collapsed state.
    *
    * ATOMIC for concurrent readers by default (`atomic = true`) when
    * the table already exists: the new state is staged into a side
    * table (`<table>_GRAFT_STG`), then swapped in so a reader polling
    * mid-replace only ever observes the complete old or the complete
    * new contents, never empty/partial. Swap strategy:
    *
    *   - `truncate = false`: staging + rename swap — one atomic
    *     multi-`RENAME TABLE` statement on MySQL/MariaDB, a
    *     transactional `DROP` + rename on dialects with transactional
    *     DDL (Derby, PostgreSQL). The table takes the staging table's
    *     definition (same posture as Spark's drop+create overwrite).
    *   - `truncate = true`: staging + ONE `DELETE`+`INSERT…SELECT`
    *     transaction — keeps the existing table definition (grants,
    *     indexes) AND is atomic on every dialect with transactional
    *     DML (i.e. all of them). Dialects without a known rename
    *     syntax (or with auto-committing DDL, e.g. H2) also take this
    *     path regardless of `truncate`, since their rename cannot be
    *     made atomic.
    *
    * Isolation fine print for the DML swap: "never sees partial" holds
    * at the reader's statement-snapshot level. MVCC engines
    * (PostgreSQL, MySQL/InnoDB) give every single statement a
    * consistent snapshot even at READ COMMITTED, so any reader
    * qualifies. Lock-based engines (Derby) release read locks per row
    * at READ COMMITTED, so a scan racing the swap's commit can
    * interleave old and new rows — and REPEATABLE READ still admits
    * the inserted rows as phantoms; on such engines a reader needs
    * SERIALIZABLE (table-level share lock for the scan) for the
    * guarantee. The rename swap has no such caveat anywhere: the
    * reader's statement either resolves the old table or the new one
    * (lock-based engines simply block the `DROP` until in-flight scans
    * finish).
    *
    * `atomic = false` restores the plain Spark JDBC overwrite (the
    * documented non-atomic truncate-or-recreate) for sinks with no
    * concurrent readers. A crash mid-replace never corrupts the live
    * table: the staging write is invisible, the swap is one
    * transaction (or one atomic statement), and a leftover staging
    * table is dropped by the next replace. The whole-state transaction
    * is the price of bootstrap/repair; steady state uses the O(batch)
    * [[upsertKeys]]. */
  def replace(df: DataFrame, url: String, table: String,
      batchSize: Int = 1000, truncate: Boolean = false,
      options: Map[String, String] = Map.empty,
      atomic: Boolean = true): Unit = {
    if (!atomic || !tableExists(url, table, options)) {
      // creation (no reader can exist) or explicitly non-atomic
      writer(df, batchSize, options)
        .option("url", url).option("dbtable", table)
        .option("truncate", truncate.toString)
        .mode("overwrite").save()
    } else {
      val stg = stagingName(table)
      // (a crashed previous replace's staging leftover is handled by the
      // overwrite itself — Spark's JDBC overwrite drops and recreates)
      writer(df, batchSize, options)
        .option("url", url).option("dbtable", stg)
        .mode("overwrite").save()
      val conn = connect(url, options)
      val swapped =
        try {
          if (!truncate && Rename.supported(url)) {
            Rename.swap(conn, url, table, stg); true
          } else if (sameColumns(conn, table, df.columns)) {
            // definition-preserving swap: portable transactional DML
            conn.setAutoCommit(false)
            val quote = JdbcDialects.get(url).quoteIdentifier _
            val cols = df.columns.map(quote).mkString(", ")
            execute(conn, s"DELETE FROM $table")
            execute(conn,
              s"INSERT INTO $table ($cols) SELECT $cols FROM $stg")
            conn.commit()
            true
          } else if (Rename.supported(url)) {
            // truncate was requested but the existing definition cannot
            // hold the new schema — the rename swap (which adopts the
            // staging definition) beats failing the repair
            Rename.swap(conn, url, table, stg); true
          } else false
        } catch {
          case e: Throwable =>
            try { if (!conn.getAutoCommit) conn.rollback() }
            catch { case _: Throwable => () }
            throw e
        } finally conn.close()
      if (!swapped) {
        // schema changed AND the dialect has no atomic rename: the only
        // remaining move is the non-atomic drop+recreate — a replace
        // whose column set drifted must still succeed (it is the repair
        // path after an upstream schema change), even at the cost of
        // the brief reader-visible gap this method otherwise avoids
        writer(df, batchSize, options)
          .option("url", url).option("dbtable", table)
          .mode("overwrite").save()
      }
      dropIfExists(url, stg, options)
    }
  }

  /** Whether `table`'s column names (case-insensitive) equal `cols` —
    * decides if the definition-preserving DML swap can represent the
    * incoming frame. One metadata probe, no scan. */
  private def sameColumns(conn: Connection, table: String,
      cols: Array[String]): Boolean = {
    val st = conn.createStatement()
    try {
      val md = st.executeQuery(s"SELECT * FROM $table WHERE 1=0")
        .getMetaData
      (1 to md.getColumnCount).map(md.getColumnName(_).toLowerCase).toSet ==
        cols.map(_.toLowerCase).toSet
    } finally st.close()
  }

  private def stagingName(table: String): String = table + "_GRAFT_STG"

  private def execute(conn: Connection, sql: String): Unit = {
    val st = conn.createStatement()
    try { st.executeUpdate(sql); () } finally st.close()
  }

  /** Dialect-specific atomic table swap by rename. MySQL's multi-table
    * `RENAME TABLE` is a single atomic statement; Derby and PostgreSQL
    * have transactional DDL, so drop-old + rename-staging commits as
    * one unit. Dialects absent here fall back to the DML swap. */
  private object Rename {
    def supported(url: String): Boolean =
      url.startsWith("jdbc:mysql") || url.startsWith("jdbc:mariadb") ||
        url.startsWith("jdbc:derby") || url.startsWith("jdbc:postgresql")

    def swap(conn: Connection, url: String, table: String,
        stg: String): Unit =
      if (url.startsWith("jdbc:mysql") || url.startsWith("jdbc:mariadb")) {
        // one atomic statement (DDL auto-commits, so a transaction
        // would not help — the atomicity is the statement's own)
        val trash = table + "_GRAFT_OLD"
        execute(conn, s"DROP TABLE IF EXISTS $trash")
        execute(conn,
          s"RENAME TABLE $table TO $trash, $stg TO $table")
        execute(conn, s"DROP TABLE $trash")
      } else {
        conn.setAutoCommit(false)
        execute(conn, s"DROP TABLE $table")
        if (url.startsWith("jdbc:derby"))
          execute(conn, s"RENAME TABLE $stg TO $table")
        else execute(conn, s"ALTER TABLE $stg RENAME TO $table")
        conn.commit()
      }
  }

  /** Drop `table` if present; a missing table is fine, any other
    * failure propagates. */
  private def dropIfExists(url: String, table: String,
      options: Map[String, String]): Unit = {
    val conn = connect(url, options)
    try execute(conn, s"DROP TABLE $table")
    catch {
      case e: java.sql.SQLException if isMissingTable(e) => ()
    } finally conn.close()
  }

  /** SQLStates (plus vendor codes) that mean "table does not exist":
    * 42X05 Derby, 42S02 MySQL/H2/ODBC, 42P01 PostgreSQL, S0002 legacy
    * ODBC, 42Y55 Derby DROP-target, 42704 DB2 undefined-name; vendor
    * codes 1146 (MySQL), 942 (Oracle ORA-00942), 60 (ClickHouse
    * UNKNOWN_TABLE — the reference's own sink); message probes for
    * dialects that report no usable state (SQLite "no such table",
    * ClickHouse/MySQL "doesn't exist", Oracle's text). Anything else —
    * connection loss, timeout, auth — is NOT evidence of absence and
    * rethrows, so a transient failure can never trigger a bootstrap
    * replace over a live table (ADVICE r9). */
  private val MissingTableStates =
    Set("42X05", "42S02", "42P01", "S0002", "42Y55", "42704")
  private def isMissingTable(e: java.sql.SQLException): Boolean =
    Option(e.getSQLState).exists(MissingTableStates.contains) ||
      e.getErrorCode == 1146 || e.getErrorCode == 942 ||
      e.getErrorCode == 60 ||
      Option(e.getMessage).exists { m =>
        val l = m.toLowerCase
        l.contains("no such table") || l.contains("doesn't exist") ||
          l.contains("table or view does not exist")
      }

  /** Whether `table` exists at `url` — drives the bootstrap-vs-delta
    * choice in [[graft.streaming.CdcStream.startToJdbc]]. One
    * driver-side metadata probe (`SELECT * … WHERE 1=0`), no scan.
    * Only a table-not-found error maps to `false`; a transient failure
    * (network blip, timeout, auth) RETHROWS so the caller's micro-batch
    * fails and replays instead of "bootstrapping" a full-state replace
    * over a live table it merely couldn't reach (ADVICE r9). */
  def tableExists(url: String, table: String,
      options: Map[String, String] = Map.empty): Boolean = {
    val conn = connect(url, options)
    try {
      val st = conn.createStatement()
      try { st.executeQuery(s"SELECT * FROM $table WHERE 1=0"); true }
      finally st.close()
    } catch {
      case e: java.sql.SQLException if isMissingTable(e) => false
    } finally conn.close()
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
            else ps.setObject(i + 1, jdbcValue(row.get(fi)))
          }
          ps.addBatch()
          pending += 1
          if (pending >= batchSize) { ps.executeBatch(); pending = 0 }
        }
        if (pending > 0) { ps.executeBatch(); () }
      } finally ps.close()
    }
  }

  /** Spark Rows surface date/time values as java.time types
    * (spark.sql.datetime.java8API.enabled, the Spark 4 default); JDBC
    * 4.2 `setObject` support for them is spotty (Derby rejects
    * LocalDateTime→TIMESTAMP), so bind the java.sql equivalents every
    * driver accepts. */
  private def jdbcValue(v: Any): Any = v match {
    case ld: java.time.LocalDate => java.sql.Date.valueOf(ld)
    case ldt: java.time.LocalDateTime => java.sql.Timestamp.valueOf(ldt)
    case ins: java.time.Instant => java.sql.Timestamp.from(ins)
    case other => other
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
