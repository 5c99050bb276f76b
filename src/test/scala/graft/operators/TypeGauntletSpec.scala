package graft.operators

import graft.TestSpark
import graft.config.Rule
import graft.functions.TypeMapper
import graft.model.{Catalog, TableDef}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's `test_river` type-conversion gauntlet
  * (FIXTURES.md §A1; reference river/river_test.go:39-53, assertions
  * 278-400) through the envelope path: binlog-style wire values in, fully
  * normalized typed rows out. */
class TypeGauntletSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private val defn = TableDef(StructType(Seq(
    TypeMapper.toField("id", "int"),
    TypeMapper.toField("title", "varchar(256)"),
    TypeMapper.toField("content", "varchar(256)"),
    TypeMapper.toField("mylist", "varchar(256)"),
    TypeMapper.toField("mydate", "int(10)"),
    TypeMapper.toField("tenum", "enum('e1','e2','e3')"),
    TypeMapper.toField("tset", "set('a','b','c')"),
    TypeMapper.toField("tbit", "bit(1)"),
    TypeMapper.toField("tdatetime", "datetime"),
    TypeMapper.toField("tdate", "date"),
    TypeMapper.toField("ip", "int unsigned"))), Seq("id"))

  // the reference's rule fixture (river/river_test.go:97-101)
  private val rule = Rule("db", "test_river", "sink", "test_river",
    fieldMapping = Map("title" -> "es_title",
      "mylist" -> "es_mylist,list", "mydate" -> ",date"))

  private def event(id: String, values: Map[String, String]) =
    Seq((1L, 1L, "db", "test_river", "I", Map("id" -> id), values))
      .toDF("seq", "tsMs", "schema", "table", "op", "key", "after")
      .withColumn("before",
        org.apache.spark.sql.functions.lit(null)
          .cast("map<string,string>"))

  private def convert(values: Map[String, String]) = {
    val cat = new Catalog()
    cat.register("db", "test_river", defn)
    Envelope.toTyped(
      Envelope.forTable(event(values("id"), values), "db", "test_river"),
      defn, rule).collect()(0)
  }

  test("the full gauntlet row converts like the reference asserts") {
    val row = convert(Map(
      "id" -> "1", "title" -> "hello", "content" -> "c",
      "mylist" -> "a,b,c", "mydate" -> "1500000000",
      "tenum" -> "2", // binlog 1-based index -> 'e2'
      "tset" -> "5", // bitmask 101 -> 'a,c'
      "tbit" -> "1",
      "tdatetime" -> "2024-03-01 10:20:30",
      "tdate" -> "2024-03-01",
      "ip" -> "3748168280")) // unsigned survives (river_test.go:380-382)
    val get = row.getValuesMap[Any](Seq("id", "es_title", "es_mylist",
      "mydate", "tenum", "tset", "tbit", "tdatetime", "tdate", "ip"))
    assert(get("id") == 1)
    assert(get("es_title") == "hello") // rename (river_test.go:315)
    assert(get("es_mylist") == Seq("a", "b", "c")) // list (346)
    assert(get("mydate").toString.startsWith("2017-07-14"))
    assert(get("tenum") == "e2") // enum round-trip (292)
    assert(get("tset") == "a,c") // set round-trip (293)
    assert(get("tbit") == 1L)
    assert(get("tdatetime").toString == "2024-03-01 10:20:30.0")
    assert(get("tdate").toString == "2024-03-01")
    assert(get("ip") == 3748168280L)
  }

  test("invalid enum index -> empty string (river_test.go:350-352)") {
    val row = convert(Map("id" -> "1", "tenum" -> "5"))
    assert(row.getAs[String]("tenum") == "")
  }

  test("zero dates -> null (river_test.go:374-377)") {
    val row = convert(Map("id" -> "1", "tdate" -> "0000-00-00",
      "tdatetime" -> "0000-00-00 00:00:00"))
    assert(row.getAs[Any]("tdate") == null)
    assert(row.getAs[Any]("tdatetime") == null)
  }

  test("TypeMapper parses the width/sign/args matrix") {
    import org.apache.spark.sql.types.{DecimalType => DT}
    def dt(s: String) = TypeMapper.toField("c", s).dataType
    assert(dt("tinyint") == ByteType && dt("tinyint unsigned") == ShortType)
    assert(dt("int(10)") == IntegerType && dt("int(10) unsigned") == LongType)
    assert(dt("bigint") == LongType && dt("bigint unsigned") == DT(20, 0))
    assert(dt("decimal(12,4)") == DT(12, 4) && dt("decimal") == DT(18, 2))
    assert(dt("varchar(99)") == StringType && dt("mediumblob") == BinaryType)
    assert(dt("datetime(6)") == TimestampType && dt("year") == ShortType)
    assert(dt("wat") == StringType) // fallback (README.md:166)
    val e = TypeMapper.toField("e", "enum('x','it''s')")
    assert(e.metadata.getStringArray(TypeMapper.EnumValuesKey).toSeq ==
      Seq("x", "it's"))
  }
}
