package graft.model

import graft.TestSpark
import graft.config.Rule
import graft.operators.Projection
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class CatalogSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  test("no-PK tables rejected, or skipped with skipNoPkTable") {
    val strict = new Catalog()
    intercept[IllegalArgumentException] {
      strict.register("db", "t", TableDef(schema, Seq.empty))
    }
    val lenient = new Catalog(skipNoPkTable = true)
    assert(!lenient.register("db", "t", TableDef(schema, Seq.empty)))
    assert(lenient.get("db", "t").isEmpty)
  }

  test("refresh swaps the definition (ST6 registry half)") {
    val cat = new Catalog()
    cat.register("db", "t", TableDef(schema, Seq("id")))
    val wider = StructType(schema.fields :+ StructField("extra", StringType))
    cat.refresh("db", "t", TableDef(wider, Seq("id")))
    assert(cat.get("db", "t").get.schema.fieldNames.contains("extra"))
  }

  test("pk columns must exist in the schema") {
    intercept[IllegalArgumentException] {
      TableDef(schema, Seq("missing"))
    }
  }

  test("tableNames lists a schema's tables for wildcard expansion (S3)") {
    val cat = new Catalog()
    cat.register("db", "t2024_01", TableDef(schema, Seq("id")))
    cat.register("db", "t2024_02", TableDef(schema, Seq("id")))
    cat.register("other", "x", TableDef(schema, Seq("id")))
    assert(Rule.expand("t2024_.*", cat.tableNames("db")) ==
      Seq("t2024_01", "t2024_02"))
  }

  test("Projection.forSink: sink columns define the default filter (S5)") {
    val spark = TestSpark.session
    import spark.implicits._
    val df = Seq((1L, "n", "drop-me")).toDF("id", "name", "internal")
    val rule = Rule("db", "t", "sink", "t",
      fieldMapping = Map("name" -> "title"))
    // sink has (id, title) -> internal is projected away, name renamed
    val out = Projection.forSink(rule, Seq("id", "title"))(df)
    assert(out.columns.toSeq == Seq("id", "title"))
    // explicit filter wins over sink-derived
    val explicit = rule.copy(filter = Seq("internal"))
    val out2 = Projection.forSink(explicit, Seq("id", "title"))(df)
    assert(out2.columns.toSeq == Seq("internal"))
  }

  test("Projection.forSinkDir discovers columns from the sink itself") {
    val spark = TestSpark.session
    import spark.implicits._
    val work = java.nio.file.Files
      .createTempDirectory("graft_sinkdisc_").toString
    val df = Seq((1L, "n", "drop-me")).toDF("id", "name", "internal")
    val rule = Rule("db", "t", "sink", "t",
      fieldMapping = Map("name" -> "title"))
    // no sink yet -> plain rule projection (every column flows)
    assert(Projection.discoverSinkColumns(spark, s"$work/sink").isEmpty)
    val first = Projection.forSinkDir(rule, s"$work/sink")(df)
    assert(first.columns.toSeq == Seq("id", "title", "internal"))
    // sink exists with (id, title) -> discovered default projection
    Seq((0L, "seed")).toDF("id", "title").write.parquet(s"$work/sink")
    val out = Projection.forSinkDir(rule, s"$work/sink")(df)
    assert(out.columns.toSeq == Seq("id", "title"))
  }
}
