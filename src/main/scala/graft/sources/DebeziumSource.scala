package graft.sources

import graft.model.{Catalog, ChangeEvent}
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Adapter from Debezium-format MySQL change events (the de-facto open
  * CDC wire format) to the engine's [[graft.model.ChangeEvent]] envelope.
  *
  * This closes the migration path the reference covers with its embedded
  * binlog reader (`canal.RunFrom(pos)`, reference: river/river.go:102-151):
  * no live MySQL exists in this environment, so instead of an untestable
  * socket client the engine consumes the standard JSON that a Debezium
  * MySQL connector (or any compatible producer) emits to Kafka/files —
  * `spark.readStream` over that feed + [[fromJson]] + the envelope
  * pipeline is the full reference topology.
  *
  * Field mapping (Debezium MySQL envelope, public format):
  *   - `payload.op`: c (create) / r (snapshot read) → I, u → U, d → D —
  *     r→I is exactly the reference's dump-bootstrap-as-inserts
  *     (river/river.go:324-335)
  *   - `payload.source.db` / `source.table` → envelope schema/table
  *   - `payload.before` / `payload.after` → string-encoded maps (the
  *     envelope is schemaless by design; the registry casts later)
  *   - `key` = after (before for deletes) — the typed projection
  *     extracts PK columns from it ([[graft.operators.Envelope.toTyped]])
  *   - `seq` = binlog position packed as (file ordinal << 40) | pos —
  *     the monotonic order of (mysql-bin.NNNNNN, pos), i.e. the same
  *     total order the reference's single-threaded reader consumed and
  *     its master.info checkpointed (river/master.go:53-83). A Kafka
  *     deployment can instead pass its partition offset via `seqCol`.
  *
  * Rows that do not parse as change events (heartbeats, tombstones) have
  * no op and are dropped by [[fromJson]]. Schema-change messages are NOT
  * noise: [[applySchemaChanges]] parses them (structured `tableChanges`
  * first, DDL-string fallback) and applies CREATE/ALTER/DROP to the
  * [[graft.model.Catalog]], closing the reference's wire-driven DDL loop
  * (`OnTableChanged` → re-fetch TableInfo → `updateRule`,
  * river/sync.go:54-60, river/river.go:166-180) with no caller
  * involvement — [[ingest]] does both in one call per batch.
  */
object DebeziumSource {

  /** The Debezium payload fields the envelope needs. `before`/`after`
    * parse as map<string,string>: Spark stringifies scalar JSON values
    * and keeps nested objects as their JSON text — exactly the
    * envelope's string encoding. */
  val payloadSchema: StructType = StructType(Seq(
    StructField("before", MapType(StringType, StringType)),
    StructField("after", MapType(StringType, StringType)),
    StructField("source", StructType(Seq(
      StructField("db", StringType),
      StructField("table", StringType),
      StructField("file", StringType),
      StructField("pos", LongType),
      StructField("ts_ms", LongType)))),
    StructField("op", StringType),
    StructField("ts_ms", LongType)))

  private val wrapperSchema: StructType =
    StructType(Seq(StructField("payload", payloadSchema)))

  /** Monotonic sequence from a binlog (file, pos) pair: numeric suffix
    * of `mysql-bin.NNNNNN` shifted above the intra-file position (a
    * binlog file position fits 32 bits; 40 leaves margin). */
  private def binlogSeq(file: Column, pos: Column): Column =
    shiftleft(coalesce(
      regexp_extract(file, "([0-9]+)$", 1).cast("long"), lit(0L)), 40) +
      coalesce(pos, lit(0L))

  /** Parse a DataFrame of Debezium JSON strings into the engine
    * envelope. Accepts both the schema-wrapped shape
    * (`{"schema": ..., "payload": {...}}`) and the bare payload
    * (`{"op": "c", ...}`, converter `schemas.enable=false`). */
  def fromJson(lines: DataFrame, jsonCol: String = "value"): DataFrame = {
    val wrapped = from_json(col(jsonCol), wrapperSchema).getField("payload")
    val bare = from_json(col(jsonCol), payloadSchema)
    val p = when(wrapped.getField("op").isNotNull, wrapped).otherwise(bare)
    val op = p.getField("op")
    val before = p.getField("before")
    val after = p.getField("after")
    val src = p.getField("source")
    lines
      .select(
        binlogSeq(src.getField("file"), src.getField("pos")).as("seq"),
        coalesce(p.getField("ts_ms"), src.getField("ts_ms"), lit(0L))
          .as("tsMs"),
        src.getField("db").as("schema"),
        src.getField("table").as("table"),
        // c = insert, r = snapshot read (bootstrap insert), u/d as-is
        when(op.isin("c", "r"), lit(ChangeEvent.OpInsert))
          .when(op === "u", lit(ChangeEvent.OpUpdate))
          .when(op === "d", lit(ChangeEvent.OpDelete))
          .as("op"),
        when(op === "d", before).otherwise(after).as("key"),
        before.as("before"),
        after.as("after"))
      .filter(col("op").isNotNull && col("schema").isNotNull &&
        col("table").isNotNull)
  }

  // ------------------------------------------------------------------
  // Wire-driven DDL (reference: OnTableChanged → updateRule,
  // river/sync.go:54-60): Debezium schema-change messages carry either a
  // structured `tableChanges` array (the connector's own post-DDL view of
  // the table — the analogue of the reference re-fetching TableInfo) or
  // just the raw `ddl` string. Both are recognized.
  // ------------------------------------------------------------------

  private val ddlColumnSchema = StructType(Seq(
    StructField("name", StringType),
    StructField("typeName", StringType),
    StructField("typeExpression", StringType),
    StructField("optional", BooleanType)))

  /** Debezium schema-change payload (public format of the schema-history /
    * schema-change topic). `tableChanges[].table` is the FULL post-DDL
    * table definition, so applying it is a swap, not a diff. */
  val ddlPayloadSchema: StructType = StructType(Seq(
    StructField("source", StructType(Seq(
      StructField("db", StringType),
      StructField("file", StringType),
      StructField("pos", LongType)))),
    StructField("databaseName", StringType),
    StructField("ddl", StringType),
    StructField("tableChanges", ArrayType(StructType(Seq(
      StructField("type", StringType),
      StructField("id", StringType),
      StructField("table", StructType(Seq(
        StructField("primaryKeyColumnNames", ArrayType(StringType)),
        StructField("columns", ArrayType(ddlColumnSchema)))))))))))

  private val ddlWrapperSchema: StructType =
    StructType(Seq(StructField("payload", ddlPayloadSchema)))

  /** Extract schema-change messages (in binlog order) from a mixed feed.
    * The cheap substring prefilter keeps the second JSON parse off row
    * events — in a real deployment schema changes also arrive on their
    * own topic, so this frame is usually tiny. */
  def schemaChanges(lines: DataFrame, jsonCol: String = "value")
      : DataFrame = {
    val candidates = lines.filter(
      col(jsonCol).contains("\"ddl\"") ||
        col(jsonCol).contains("tableChanges"))
    val wrapped =
      from_json(col(jsonCol), ddlWrapperSchema).getField("payload")
    val bare = from_json(col(jsonCol), ddlPayloadSchema)
    val p = when(wrapped.getField("ddl").isNotNull ||
        wrapped.getField("tableChanges").isNotNull, wrapped)
      .otherwise(bare)
    val src = p.getField("source")
    candidates
      .select(
        binlogSeq(src.getField("file"), src.getField("pos")).as("seq"),
        coalesce(p.getField("databaseName"), src.getField("db"))
          .as("db"),
        p.getField("ddl").as("ddl"),
        p.getField("tableChanges").as("table_changes"))
      .filter(col("ddl").isNotNull ||
        (col("table_changes").isNotNull && size(col("table_changes")) > 0))
  }

  /** `"db"."tbl"` / `` `db`.`tbl` `` / `tbl` → (db-or-default, tbl). */
  private def splitId(id: String, defaultDb: String): (String, String) = {
    val parts = id.split("\\.").map(_.replaceAll("[`\"]", "").trim)
    if (parts.length >= 2) (parts(0), parts(1)) else (defaultDb, parts(0))
  }

  /** Split a CREATE TABLE body (or ALTER clause list) on commas not
    * nested in parentheses and not inside single-quoted strings —
    * enum/set values may legally contain commas AND parens
    * (`enum('a','b,c','d(e')`), and an unbalanced paren inside a quote
    * would otherwise corrupt the depth count and silently swallow every
    * later column. Handles MySQL's doubled-quote and backslash escapes
    * inside values. (A close-paren inside a value still defeats the
    * type REGEXES, same as TypeMapper's — the structured tableChanges
    * path has no such limit.) */
  private def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.Buffer.empty[String]
    val sb = new StringBuilder
    var depth = 0
    var inQ = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) {
        sb += c
        if (c == '\\' && i + 1 < s.length) { sb += s.charAt(i + 1); i += 1 }
        else if (c == '\'') {
          if (i + 1 < s.length && s.charAt(i + 1) == '\'') {
            sb += '\''; i += 1 // doubled-quote escape stays inside
          } else inQ = false
        }
      } else c match {
        case '\'' => inQ = true; sb += c
        case '(' => depth += 1; sb += c
        case ')' => depth -= 1; sb += c
        case ',' if depth == 0 => out += sb.toString; sb.clear()
        case other => sb += other
      }
      i += 1
    }
    out += sb.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  // one column declaration: name, MySQL type (with optional (args) and
  // unsigned), then the remainder (NOT NULL / DEFAULT / PRIMARY KEY ...)
  private val ColumnDef =
    """(?is)[`"]?(\w+)[`"]?\s+([a-z]\w*(?:\s*\([^)]*\))?(?:\s+unsigned)?)(.*)""".r
  private val AlterTableDdl =
    """(?is)\s*alter\s+table\s+(\S+)\s+(.*?)\s*;?\s*""".r
  private val RenameTableDdl =
    """(?is)\s*rename\s+table\s+(.*?)\s*;?\s*""".r
  private val RenamePair =
    """(?is)\s*(\S+)\s+to\s+(\S+)\s*""".r
  private val DropTableDdl =
    """(?is)\s*drop\s+table\s+(?:if\s+exists\s+)?(\S+?);?\s*""".r
  private val CreateTableDdl =
    """(?is)\s*create\s+table\s+(?:if\s+not\s+exists\s+)?(\S+?)\s*\((.*)\)\s*[^)]*""".r
  private val TableConstraint =
    """(?is)\s*(primary|unique|key|index|constraint|foreign|check)\b.*""".r
  private val PkConstraint =
    """(?is)\s*primary\s+key\s*\(([^)]*)\).*""".r

  // ALTER TABLE clauses, one per top-level comma (MySQL multi-clause
  // ALTER). Index/key/constraint surgery has no column-schema effect and
  // is skipped without logging; anything unrecognized logs a skip so a
  // type change can never flow stale through the Catalog silently.
  private val ClauseNonColumn =
    """(?is)(?:add|drop)\s+(?:index|key|primary|unique|constraint|foreign|fulltext|spatial|partition)\b.*""".r
  private val ClauseAdd =
    """(?is)add\s+(?:column\s+)?[`"]?(\w+)[`"]?\s+([a-z]\w*(?:\s*\([^)]*\))?(?:\s+unsigned)?)(.*)""".r
  private val ClauseDrop =
    """(?is)drop\s+(?:column\s+)?[`"]?(\w+)[`"]?\s*""".r
  private val ClauseModify =
    """(?is)modify\s+(?:column\s+)?[`"]?(\w+)[`"]?\s+([a-z]\w*(?:\s*\([^)]*\))?(?:\s+unsigned)?)(.*)""".r
  private val ClauseChange =
    """(?is)change\s+(?:column\s+)?[`"]?(\w+)[`"]?\s+[`"]?(\w+)[`"]?\s+([a-z]\w*(?:\s*\([^)]*\))?(?:\s+unsigned)?)(.*)""".r
  private val ClauseRenameCol =
    """(?is)rename\s+column\s+[`"]?(\w+)[`"]?\s+to\s+[`"]?(\w+)[`"]?\s*""".r
  private val ClauseRenameTable =
    """(?is)rename\s+(?:to\s+|as\s+)?(\S+)\s*""".r

  /** Parse a CREATE TABLE body into a TableDef via [[TypeMapper]]. */
  private def parseCreate(body: String): graft.model.TableDef = {
    val defs = splitTop(body)
    val pkFromConstraint = defs.collectFirst {
      case PkConstraint(cols) =>
        cols.split(",").map(_.replaceAll("[`\"\\s]", "")).toSeq
    }
    val cols = defs.filterNot(TableConstraint.matches).collect {
      case ColumnDef(name, tpe, rest) =>
        val inlinePk = rest.toLowerCase.contains("primary key")
        (graft.functions.TypeMapper.toField(name, tpe,
          nullable = !rest.toLowerCase.contains("not null")), inlinePk)
    }
    val pks = pkFromConstraint.getOrElse(
      cols.collect { case (f, true) => f.name })
    graft.model.TableDef(StructType(cols.map(_._1)), pks)
  }

  /** Apply a bare-DDL `ALTER TABLE` clause list to the catalog: ADD /
    * DROP / MODIFY / CHANGE / RENAME COLUMN / RENAME [TO|AS], any number
    * of clauses per statement (top-level-comma separated, MySQL
    * multi-clause ALTER). The reference handles every one of these
    * implicitly by re-fetching the whole table on any DDL
    * (river/river.go:172-180); here each clause is a functional edit of
    * the cached TableDef. Returns true if the catalog changed. */
  private def applyAlter(catalog: Catalog, tDb: String, tbl0: String,
      clauses: String): Boolean = {
    import graft.functions.TypeMapper
    import graft.model.TableDef
    catalog.get(tDb, tbl0) match {
      case None =>
        log.info(s"ALTER for unruled table $tDb.$tbl0 skipped")
        false
      case Some(defn0) =>
        var defn = defn0
        var db = tDb
        var tbl = tbl0
        var changed = false
        def notNull(rest: String) = rest.toLowerCase.contains("not null")
        def requireCol(name: String)(edit: => Unit): Unit =
          if (defn.schema.fieldNames.contains(name)) { edit; changed = true }
          else log.warn(
            s"ALTER on $tDb.$tbl0: column $name not in cached schema, clause skipped")
        splitTop(clauses).foreach {
          case ClauseNonColumn() => () // index/constraint surgery — no column effect
          case ClauseAdd(name, tpe, rest) =>
            defn = defn.copy(schema = StructType(
              defn.schema.fields.filterNot(_.name == name) :+
                TypeMapper.toField(name, tpe, nullable = !notNull(rest))))
            changed = true
          case ClauseDrop(name) => requireCol(name) {
            defn = TableDef(
              StructType(defn.schema.fields.filterNot(_.name == name)),
              defn.pkColumns.filterNot(_ == name))
          }
          case ClauseModify(name, tpe, rest) => requireCol(name) {
            defn = defn.copy(schema = StructType(defn.schema.fields.map { f =>
              if (f.name == name)
                TypeMapper.toField(name, tpe, nullable = !notNull(rest))
              else f
            }))
          }
          case ClauseChange(oldName, newName, tpe, rest) => requireCol(oldName) {
            defn = TableDef(
              StructType(defn.schema.fields.map { f =>
                if (f.name == oldName)
                  TypeMapper.toField(newName, tpe, nullable = !notNull(rest))
                else f
              }),
              defn.pkColumns.map(c => if (c == oldName) newName else c))
          }
          case ClauseRenameCol(oldName, newName) => requireCol(oldName) {
            defn = TableDef(
              StructType(defn.schema.fields.map { f =>
                if (f.name == oldName) f.copy(name = newName) else f
              }),
              defn.pkColumns.map(c => if (c == oldName) newName else c))
          }
          case ClauseRenameTable(newId) =>
            // the new identifier may be database-qualified
            // (`RENAME TO db2.t2`) — keeping only the table part would
            // register the renamed schema under the OLD database
            val (nDb, nTbl) = splitId(newId, tDb)
            db = nDb
            tbl = nTbl
            changed = true
          case other =>
            log.warn(s"ALTER on $tDb.$tbl0: unrecognized clause skipped: " +
              other.take(120))
        }
        if (changed) {
          if (db != tDb || tbl != tbl0) catalog.drop(tDb, tbl0)
          catalog.refresh(db, tbl, defn)
        }
        changed
    }
  }

  /** Apply every schema-change message in `lines` to `catalog`, in
    * binlog order. Structured `tableChanges` wins (full post-DDL column
    * list); otherwise the DDL string is parsed for CREATE TABLE, DROP
    * TABLE, RENAME TABLE, and multi-clause ALTER TABLE (ADD / DROP /
    * MODIFY / CHANGE / RENAME COLUMN / RENAME TO). Unknown or
    * unparseable DDL (triggers, grants, ...) is skipped with a log line —
    * same effect as the reference, which only reacts to changes on ruled
    * tables. Returns the number of catalog mutations applied. DDL events
    * are rare, so the collect is a handful of rows, never data-sized. */
  def applySchemaChanges(lines: DataFrame, catalog: Catalog,
      jsonCol: String = "value"): Int = {
    import graft.functions.TypeMapper
    import graft.model.TableDef
    var applied = 0
    schemaChanges(lines, jsonCol).orderBy("seq").collect().foreach { row =>
      val db = row.getAs[String]("db")
      val changes: scala.collection.Seq[Row] =
        row.getSeq[Row](row.fieldIndex("table_changes"))
      if (changes != null && changes.nonEmpty) {
        changes.foreach { ch =>
          val (chDb, tbl) = splitId(ch.getAs[String]("id"), db)
          ch.getAs[String]("type").toUpperCase match {
            case "DROP" =>
              if (catalog.drop(chDb, tbl)) applied += 1
            case _ => // CREATE and ALTER both carry the full table
              val t = ch.getAs[Row]("table")
              if (t != null) {
                val pks = Option(t.getSeq[String](
                    t.fieldIndex("primaryKeyColumnNames")))
                  .getOrElse(Seq.empty).toSeq
                val fields = t.getSeq[Row](t.fieldIndex("columns")).map { c =>
                  TypeMapper.toField(
                    c.getAs[String]("name"),
                    Option(c.getAs[String]("typeExpression"))
                      .getOrElse(c.getAs[String]("typeName")),
                    nullable = !java.lang.Boolean.FALSE.equals(
                      c.getAs[java.lang.Boolean]("optional")))
                }
                if (catalog.refresh(chDb, tbl,
                    TableDef(StructType(fields.toSeq), pks))) applied += 1
              }
          }
        }
      } else row.getAs[String]("ddl") match {
        case CreateTableDdl(id, body) =>
          val (tDb, tbl) = splitId(id, db)
          if (catalog.refresh(tDb, tbl, parseCreate(body))) applied += 1
        case AlterTableDdl(id, clauses) =>
          val (tDb, tbl) = splitId(id, db)
          if (applyAlter(catalog, tDb, tbl, clauses)) applied += 1
        case RenameTableDdl(pairs) =>
          // RENAME TABLE a TO b [, c TO d ...]
          splitTop(pairs).foreach {
            case RenamePair(oldId, newId) =>
              val (oDb, oTbl) = splitId(oldId, db)
              val (nDb, nTbl) = splitId(newId, db)
              catalog.get(oDb, oTbl) match {
                case Some(defn) =>
                  catalog.drop(oDb, oTbl)
                  if (catalog.refresh(nDb, nTbl, defn)) applied += 1
                case None =>
                  log.info(s"RENAME TABLE for unruled table $oDb.$oTbl skipped")
              }
            case other =>
              log.warn(s"unrecognized RENAME TABLE pair skipped: $other")
          }
        case DropTableDdl(id) =>
          val (tDb, tbl) = splitId(id, db)
          if (catalog.drop(tDb, tbl)) applied += 1
        case other =>
          // not table-shape DDL (grants, triggers, ...) — no column effect
          log.info(s"non-table DDL skipped: ${Option(other).getOrElse("").take(120)}")
      }
    }
    applied
  }

  /** One call per (micro-)batch over a mixed Debezium feed: first apply
    * any schema-change messages to the catalog (wire-driven DDL — the
    * next route/merge sees the new definition with no restart and no
    * manual Catalog call), then parse the row events. */
  def ingest(lines: DataFrame, catalog: Catalog,
      jsonCol: String = "value"): DataFrame = {
    applySchemaChanges(lines, catalog, jsonCol)
    fromJson(lines, jsonCol)
  }
}
