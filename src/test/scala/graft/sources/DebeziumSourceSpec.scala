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
}
