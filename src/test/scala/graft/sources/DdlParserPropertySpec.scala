package graft.sources

import graft.TestSpark
import graft.functions.TypeMapper
import graft.model.Catalog
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the bare-DDL CREATE TABLE parser
  * (DebeziumSource.parseCreate via applySchemaChanges): generated
  * table definitions — backticked or bare names, nested parens and
  * quoted commas in enum/set/decimal types, inline vs constraint-clause
  * PKs, NOT NULL in varying case/position, DEFAULT clauses, KEY/INDEX
  * decoy constraint lines, irregular whitespace — must round-trip to
  * exactly the TableDef that TypeMapper.toField produces per column.
  * The splitTop/regex machinery is precisely the kind of code that
  * harbors quiet edge cases; the generator aims at them. */
class DdlParserPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private case class ColSpec(name: String, tpe: String, notNull: Boolean,
      default: Option[String], backtick: Boolean)

  import org.scalacheck.{Gen, Prop, Test => SCTest}

  private val genType: Gen[String] = Gen.oneOf(
    Gen.const("int"),
    Gen.const("bigint"),
    Gen.const("text"),
    Gen.const("datetime"),
    Gen.const("tinyint unsigned"),
    Gen.chooseNum(1, 255).map(n => s"varchar($n)"),
    Gen.chooseNum(1, 20).flatMap(p =>
      Gen.chooseNum(0, math.min(p, 8)).map(s => s"decimal($p,$s)")),
    Gen.const("enum('a','b,c','d(e')"), // quoted comma AND paren
    Gen.const("set('x','y,z')"),
    Gen.chooseNum(1, 30).map(n => s"int($n) unsigned"))

  private val genName: Gen[String] = for {
    h <- Gen.alphaLowerChar
    t <- Gen.stringOfN(5, Gen.oneOf(Gen.alphaLowerChar, Gen.numChar,
      Gen.const('_')))
  } yield s"$h$t"

  private val genCol: Gen[ColSpec] = for {
    name <- genName
    tpe <- genType
    notNull <- Gen.oneOf(true, false)
    default <- Gen.oneOf(Gen.const(None), Gen.const(Some("DEFAULT NULL")),
      Gen.const(Some("DEFAULT 'v'")))
    backtick <- Gen.oneOf(true, false)
  } yield ColSpec(name, tpe, notNull, default, backtick)

  private case class TableSpec(cols: Seq[ColSpec], pkIdx: Seq[Int],
      inlinePk: Boolean, decoyKey: Boolean, ifNotExists: Boolean,
      sloppyWs: Boolean)

  private val genTable: Gen[TableSpec] = for {
    n <- Gen.chooseNum(1, 7)
    cols0 <- Gen.listOfN(n, genCol)
    // distinct names, else the parser legitimately keeps the last one
    cols = cols0.zipWithIndex.map { case (c, i) => c.copy(name = s"${c.name}$i") }
    pkCount <- Gen.chooseNum(1, math.min(2, n))
    pkIdx <- Gen.pick(pkCount, cols.indices).map(_.toSeq.sorted)
    inlinePk <- Gen.oneOf(true, false)
    decoyKey <- Gen.oneOf(true, false)
    ifNotExists <- Gen.oneOf(true, false)
    sloppyWs <- Gen.oneOf(true, false)
  } yield TableSpec(cols, pkIdx, inlinePk && pkIdx.length == 1, decoyKey,
    ifNotExists, sloppyWs)

  private def renderDdl(t: TableSpec): String = {
    val ws = if (t.sloppyWs) "  " else " "
    val colDefs = t.cols.zipWithIndex.map { case (c, i) =>
      val nm = if (c.backtick) s"`${c.name}`" else c.name
      val inline =
        if (t.inlinePk && t.pkIdx == Seq(i)) s"${ws}PRIMARY KEY" else ""
      val nn = if (c.notNull) s"${ws}NOT NULL" else ""
      val dflt = c.default.fold("")(d => s"$ws$d")
      s"$nm$ws${c.tpe}$nn$dflt$inline"
    }
    val pkClause =
      if (t.inlinePk) Seq.empty
      else Seq(s"PRIMARY KEY (${t.pkIdx.map(i => t.cols(i).name)
        .mkString(", ")})")
    val decoy =
      if (t.decoyKey) Seq(s"KEY idx_x (${t.cols.head.name})") else Seq.empty
    val ine = if (t.ifNotExists) "IF NOT EXISTS " else ""
    s"CREATE TABLE $ine`t` (${(colDefs ++ pkClause ++ decoy)
      .mkString(s",$ws")})"
  }

  private def expected(t: TableSpec): graft.model.TableDef =
    graft.model.TableDef(
      StructType(t.cols.map(c =>
        TypeMapper.toField(c.name, c.tpe, nullable = !c.notNull))),
      t.pkIdx.map(i => t.cols(i).name))

  test("scalacheck: generated CREATE TABLE bodies parse to the exact TableDef") {
    val prop = Prop.forAll(genTable) { t =>
      val cat = new Catalog()
      val ddl = renderDdl(t).replace("\\", "").replace("\"", "\\\"")
      val msg =
        s"""{"source": {"db": "inv", "file": "f.000001", "pos": 1},
           | "databaseName": "inv", "ddl": "$ddl"}"""
          .stripMargin.replaceAll("\n", "")
      DebeziumSource.applySchemaChanges(Seq(msg).toDF("value"), cat)
      val got = cat.get("inv", "t")
      val want = expected(t)
      if (got.contains(want)) true
      else {
        System.err.println(s"DDL: ${renderDdl(t)}\n got: $got\nwant: $want")
        false
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(80), prop)
    assert(res.passed, res.status.toString)
  }
}
