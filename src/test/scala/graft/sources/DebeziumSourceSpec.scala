package graft.sources

import graft.TestSpark
import graft.config.Rule
import graft.model.{Catalog, TableDef}
import graft.operators.{CdcMerge, Envelope}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class DebeziumSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def bare(op: String, file: String, pos: Long,
      before: String, after: String): String =
    s"""{"before": $before, "after": $after,
       | "source": {"db": "inv", "table": "cust", "file": "$file",
       |   "pos": $pos, "ts_ms": 1589362330000},
       | "op": "$op", "ts_ms": 1589362330904}""".stripMargin
      .replaceAll("\n", "")

  test("maps Debezium ops, binlog order, and key extraction") {
    val lines = Seq(
      // wrapped shape (converter schemas.enable=true)
      s"""{"schema": {"type": "struct"}, "payload": ${bare("r",
        "mysql-bin.000001", 100,
        "null", """{"id": 1, "name": "ann", "bal": 10.5}""")}}""",
      bare("c", "mysql-bin.000001", 250,
        "null", """{"id": 2, "name": "bob", "bal": 3}"""),
      bare("u", "mysql-bin.000002", 50,
        """{"id": 1, "name": "ann", "bal": 10.5}""",
        """{"id": 1, "name": "ann2", "bal": 11}"""),
      bare("d", "mysql-bin.000002", 90,
        """{"id": 2, "name": "bob", "bal": 3}""", "null"),
      """{"kind": "heartbeat"}""" // no op -> dropped
    ).toDF("value")
    val env = DebeziumSource.fromJson(lines)
    val rows = env.as[graft.model.ChangeEvent].collect()
      .sortBy(_.seq)
    assert(rows.length == 4)
    assert(rows.map(_.op).toSeq == Seq("I", "I", "U", "D"))
    // binlog file rolls over: file 2 events sort after every file-1 pos
    assert(rows.map(_.seq).toSeq == rows.map(_.seq).toSeq.sorted)
    assert(rows(0).seq == (1L << 40) + 100)
    assert(rows(2).seq == (2L << 40) + 50)
    // scalars stringified; snapshot read became insert
    assert(rows(0).after == Map("id" -> "1", "name" -> "ann",
      "bal" -> "10.5"))
    // delete carries its key from the before image
    assert(rows(3).key("id") == "2")
    assert(rows.forall(_.schema == "inv"))
  }

  test("edge cases: missing binlog file, malformed lines, null maps") {
    val lines = Seq(
      // no source.file (e.g. a producer that omits it): seq = pos only
      """{"before": null, "after": {"id": 5},
        | "source": {"db": "inv", "table": "cust", "pos": 77,
        |   "ts_ms": 1}, "op": "c", "ts_ms": 2}"""
        .stripMargin.replaceAll("\n", ""),
      "not json at all",
      "{\"half\": true}",
      // delete with null after keeps key from before
      """{"before": {"id": 9}, "after": null,
        | "source": {"db": "inv", "table": "cust",
        |   "file": "mysql-bin.000007", "pos": 3, "ts_ms": 1},
        | "op": "d", "ts_ms": 2}""".stripMargin.replaceAll("\n", "")
    ).toDF("value")
    val rows = DebeziumSource.fromJson(lines)
      .as[graft.model.ChangeEvent].collect().sortBy(_.seq)
    assert(rows.length == 2)
    assert(rows(0).seq == 77L && rows(0).op == "I")
    assert(rows(1).seq == (7L << 40) + 3 && rows(1).op == "D")
    assert(rows(1).key == Map("id" -> "9") && rows(1).after == null)
  }

  test("end-to-end: Debezium feed -> envelope route -> LWW state") {
    val lines = Seq(
      bare("r", "mysql-bin.000001", 10,
        "null", """{"id": 1, "name": "ann", "bal": 10.5}"""),
      bare("c", "mysql-bin.000001", 20,
        "null", """{"id": 2, "name": "bob", "bal": 3}"""),
      bare("u", "mysql-bin.000002", 30,
        """{"id": 1, "name": "ann", "bal": 10.5}""",
        """{"id": 1, "name": "ann2", "bal": 11}"""),
      bare("d", "mysql-bin.000002", 40,
        """{"id": 2, "name": "bob", "bal": 3}""", "null")
    ).toDF("value")
    val cat = new Catalog()
    cat.register("inv", "cust", TableDef(StructType(Seq(
      StructField("id", IntegerType),
      StructField("name", StringType),
      StructField("bal", DoubleType))), Seq("id")))
    val rule = Rule("inv", "cust", "sink", "cust")
    val typed = Envelope.route(DebeziumSource.fromJson(lines),
      Seq(rule), cat)(("inv", "cust"))
    val state = CdcMerge.lastWriteWins(typed, Seq("id"))
      .as[(Int, String, Double)].collect().toSet
    assert(state == Set((1, "ann2", 11.0)))
  }

  // ---- wire-driven DDL (reference OnTableChanged -> updateRule) ----

  private def custRow(op: String, pos: Long, after: String,
      before: String = "null"): String =
    s"""{"before": $before, "after": $after,
       | "source": {"db": "inv", "table": "cust",
       |   "file": "mysql-bin.000009", "pos": $pos, "ts_ms": 1},
       | "op": "$op", "ts_ms": 2}""".stripMargin.replaceAll("\n", "")

  test("wire-driven DDL: CREATE via tableChanges, ALTER via ddl string," +
      " rows pick up the new column with no restart or manual call") {
    val cat = new Catalog()
    // batch 1: CREATE TABLE arrives as a structured schema-change
    // message (Debezium tableChanges) interleaved BEFORE its rows
    val batch1 = Seq(
      """{"source": {"db": "inv", "file": "mysql-bin.000009", "pos": 1},
        | "databaseName": "inv",
        | "ddl": "CREATE TABLE cust (id int, name varchar(64))",
        | "tableChanges": [{"type": "CREATE", "id": "\"inv\".\"cust\"",
        |   "table": {"primaryKeyColumnNames": ["id"], "columns": [
        |     {"name": "id", "typeName": "INT", "typeExpression": "INT",
        |      "optional": false},
        |     {"name": "name", "typeName": "VARCHAR",
        |      "typeExpression": "VARCHAR(64)", "optional": true}]}}]}"""
        .stripMargin.replaceAll("\n", ""),
      custRow("c", 10, """{"id": 1, "name": "ann"}"""),
      custRow("c", 20, """{"id": 2, "name": "bob"}""")
    ).toDF("value")
    val rule = Rule("inv", "cust", "sink", "cust")
    val env1 = DebeziumSource.ingest(batch1, cat) // registers cust itself
    assert(cat.get("inv", "cust").exists(_.schema.fieldNames.toSeq ==
      Seq("id", "name")))
    val t1 = Envelope.route(env1, Seq(rule), cat)(("inv", "cust"))
    assert(CdcMerge.lastWriteWins(t1, Seq("id")).count() == 2)

    // batch 2: ALTER ADD COLUMN arrives as a ddl-string-only message
    // (no tableChanges), interleaved mid-batch; post-DDL rows carry the
    // new column — same stream, no restart, no manual Catalog call
    val batch2 = Seq(
      custRow("u", 30, """{"id": 1, "name": "ann2"}""",
        """{"id": 1, "name": "ann"}"""),
      """{"source": {"db": "inv", "file": "mysql-bin.000009", "pos": 35},
        | "databaseName": "inv",
        | "ddl": "ALTER TABLE cust ADD COLUMN bal decimal(8,2) DEFAULT NULL"}"""
        .stripMargin.replaceAll("\n", ""),
      custRow("u", 40, """{"id": 2, "name": "bob", "bal": "7.50"}""",
        """{"id": 2, "name": "bob"}""")
    ).toDF("value")
    val env2 = DebeziumSource.ingest(batch2, cat)
    assert(cat.get("inv", "cust").exists(_.schema.fieldNames.toSeq ==
      Seq("id", "name", "bal")))
    val t2 = Envelope.route(env2, Seq(rule), cat)(("inv", "cust"))
    val state = CdcMerge.lastWriteWins(t2, Seq("id"))
      .selectExpr("id", "name", "cast(bal as string) bal")
      .as[(Int, String, String)].collect().toSet
    // pre-DDL row decodes with bal=null, post-DDL row carries 7.50
    assert(state == Set((1, "ann2", null), (2, "bob", "7.50")))
  }

  test("wire-driven DDL: ALTER DROP COLUMN and DROP TABLE") {
    val cat = new Catalog()
    DebeziumSource.applySchemaChanges(Seq(
      """{"source": {"db": "inv", "file": "f.000001", "pos": 1},
        | "databaseName": "inv",
        | "ddl": "CREATE TABLE t (id bigint NOT NULL PRIMARY KEY, a int, b text)"}"""
        .stripMargin.replaceAll("\n", "")).toDF("value"), cat)
    assert(cat.get("inv", "t").exists(d =>
      d.schema.fieldNames.toSeq == Seq("id", "a", "b") &&
        d.pkColumns == Seq("id") &&
        !d.schema("id").nullable))
    val n = DebeziumSource.applySchemaChanges(Seq(
      """{"source": {"db": "inv", "file": "f.000001", "pos": 2},
        | "databaseName": "inv", "ddl": "ALTER TABLE t DROP COLUMN a"}"""
        .stripMargin.replaceAll("\n", ""),
      """{"source": {"db": "inv", "file": "f.000001", "pos": 3},
        | "databaseName": "inv", "ddl": "GRANT SELECT ON t TO x"}"""
        .stripMargin.replaceAll("\n", "")).toDF("value"), cat)
    assert(n == 1) // the GRANT is skipped
    assert(cat.get("inv", "t").exists(_.schema.fieldNames.toSeq ==
      Seq("id", "b")))
    DebeziumSource.applySchemaChanges(Seq(
      """{"source": {"db": "inv", "file": "f.000001", "pos": 4},
        | "databaseName": "inv", "ddl": "DROP TABLE t"}"""
        .stripMargin.replaceAll("\n", "")).toDF("value"), cat)
    assert(cat.get("inv", "t").isEmpty)
  }

  private def ddlMsg(pos: Long, ddl: String): String =
    s"""{"source": {"db": "inv", "file": "f.000001", "pos": $pos},
       | "databaseName": "inv", "ddl": "$ddl"}"""
      .stripMargin.replaceAll("\n", "")

  test("wire-driven DDL: MODIFY changes a column's type in place") {
    val cat = new Catalog()
    DebeziumSource.applySchemaChanges(Seq(
      ddlMsg(1, "CREATE TABLE t (id bigint NOT NULL PRIMARY KEY, a int, b text)")
    ).toDF("value"), cat)
    val n = DebeziumSource.applySchemaChanges(Seq(
      ddlMsg(2, "ALTER TABLE t MODIFY COLUMN a varchar(32) NOT NULL")
    ).toDF("value"), cat)
    assert(n == 1)
    val d = cat.get("inv", "t").get
    // type changed, position preserved, nullability applied
    assert(d.schema.fieldNames.toSeq == Seq("id", "a", "b"))
    assert(d.schema("a").dataType == StringType)
    assert(!d.schema("a").nullable)
  }

  test("wire-driven DDL: CHANGE renames and retypes; pk rename follows") {
    val cat = new Catalog()
    DebeziumSource.applySchemaChanges(Seq(
      ddlMsg(1, "CREATE TABLE t (id int NOT NULL PRIMARY KEY, a int)"),
      ddlMsg(2, "ALTER TABLE t CHANGE COLUMN id cust_id bigint NOT NULL"),
      ddlMsg(3, "ALTER TABLE t RENAME COLUMN a TO amount")
    ).toDF("value"), cat)
    val d = cat.get("inv", "t").get
    assert(d.schema.fieldNames.toSeq == Seq("cust_id", "amount"))
    assert(d.schema("cust_id").dataType == LongType)
    assert(d.pkColumns == Seq("cust_id"))
    // RENAME COLUMN keeps the original type
    assert(d.schema("amount").dataType == IntegerType)
  }

  test("wire-driven DDL: multi-clause ALTER applies every clause") {
    val cat = new Catalog()
    val n = DebeziumSource.applySchemaChanges(Seq(
      ddlMsg(1, "CREATE TABLE t (id int NOT NULL PRIMARY KEY, a int, b int)"),
      ddlMsg(2, "ALTER TABLE t ADD COLUMN c decimal(8,2), DROP COLUMN b, " +
        "MODIFY a text, ADD INDEX idx_a (a)")
    ).toDF("value"), cat)
    assert(n == 2)
    val d = cat.get("inv", "t").get
    assert(d.schema.fieldNames.toSeq == Seq("id", "a", "c"))
    assert(d.schema("a").dataType == StringType)
    // the ADD INDEX clause is recognized as non-column surgery, not a
    // bogus column named "index"
    assert(!d.schema.fieldNames.contains("index"))
  }

  test("wire-driven DDL: RENAME TABLE and ALTER ... RENAME TO") {
    val cat = new Catalog()
    DebeziumSource.applySchemaChanges(Seq(
      ddlMsg(1, "CREATE TABLE t (id int NOT NULL PRIMARY KEY, a int)"),
      ddlMsg(2, "RENAME TABLE t TO t2")
    ).toDF("value"), cat)
    assert(cat.get("inv", "t").isEmpty)
    assert(cat.get("inv", "t2").exists(_.schema.fieldNames.toSeq ==
      Seq("id", "a")))
    DebeziumSource.applySchemaChanges(Seq(
      ddlMsg(3, "ALTER TABLE t2 ADD COLUMN b int, RENAME TO t3")
    ).toDF("value"), cat)
    assert(cat.get("inv", "t2").isEmpty)
    assert(cat.get("inv", "t3").exists(_.schema.fieldNames.toSeq ==
      Seq("id", "a", "b")))
    // database-qualified RENAME TO must move the entry to the TARGET
    // database, not register it under the old one with the new name
    DebeziumSource.applySchemaChanges(Seq(
      ddlMsg(4, "ALTER TABLE t3 RENAME TO archive.t4")
    ).toDF("value"), cat)
    assert(cat.get("inv", "t3").isEmpty)
    assert(cat.get("inv", "t4").isEmpty)
    assert(cat.get("archive", "t4").exists(_.schema.fieldNames.toSeq ==
      Seq("id", "a", "b")))
  }

  test("wire-driven DDL: unknown clause / unruled table leave catalog intact") {
    val cat = new Catalog()
    DebeziumSource.applySchemaChanges(Seq(
      ddlMsg(1, "CREATE TABLE t (id int NOT NULL PRIMARY KEY, a int)")
    ).toDF("value"), cat)
    val before = cat.get("inv", "t").get
    val n = DebeziumSource.applySchemaChanges(Seq(
      // MODIFY of a column the cached schema doesn't have
      ddlMsg(2, "ALTER TABLE t MODIFY COLUMN zz int"),
      // ALTER of a table the catalog never registered
      ddlMsg(3, "ALTER TABLE nosuch ADD COLUMN x int"),
      // storage-option clause with no column effect
      ddlMsg(4, "ALTER TABLE t ENGINE=InnoDB")
    ).toDF("value"), cat)
    assert(n == 0)
    assert(cat.get("inv", "t").contains(before))
    assert(cat.get("inv", "nosuch").isEmpty)
  }

  test("wire-driven DDL: constraint-clause PK and quoted enum types") {
    val cat = new Catalog()
    DebeziumSource.applySchemaChanges(Seq(
      """{"source": {"db": "inv", "file": "f.000001", "pos": 1},
        | "databaseName": "inv",
        | "ddl": "CREATE TABLE e (x int NOT NULL, y enum('a','b,c'), PRIMARY KEY (x))"}"""
        .stripMargin.replaceAll("\n", "")).toDF("value"), cat)
    val d = cat.get("inv", "e").get
    assert(d.pkColumns == Seq("x"))
    // the enum's quoted 'b,c' must not split the column list
    assert(d.schema.fieldNames.toSeq == Seq("x", "y"))
    assert(d.schema("y").metadata.getString(
      graft.functions.TypeMapper.MysqlTypeKey) == "enum")
  }
}
