package graft.operators

import graft.TestSpark
import graft.config.Rule
import graft.model.{Catalog, TableDef}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The generic envelope path: untyped multi-table change stream →
  * registry-cast typed frames → MERGE (SURVEY §1.2 envelope-then-cast). */
class EnvelopeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private val advDef = TableDef(StructType(Seq(
    StructField("id", IntegerType),
    StructField("title", StringType),
    StructField("score", DoubleType))), Seq("id"))

  private def envelope(rows: (Long, String, String, String,
      Map[String, String], Map[String, String])*) =
    rows.toDF("seq", "schema", "table", "op", "key", "after")
      .withColumn("tsMs", $"seq")
      .withColumn("before",
        org.apache.spark.sql.functions.lit(null)
          .cast("map<string,string>"))

  test("envelope -> typed -> merge: rename, cast, delete-by-key") {
    val events = envelope(
      (1L, "db", "adv", "I", Map("id" -> "1"),
        Map("id" -> "1", "title" -> "hello", "score" -> "1.5")),
      (2L, "db", "adv", "I", Map("id" -> "2"),
        Map("id" -> "2", "title" -> "world", "score" -> "2.5")),
      (3L, "db", "adv", "U", Map("id" -> "1"),
        Map("id" -> "1", "title" -> "hello2", "score" -> "9.5")),
      (4L, "db", "adv", "D", Map("id" -> "2"), null),
      (5L, "db", "other", "I", Map("id" -> "9"),
        Map("id" -> "9"))) // unruled table -> dropped
    val cat = new Catalog()
    cat.register("db", "adv", advDef)
    val rule = Rule("db", "adv", "sink", "adv",
      fieldMapping = Map("title" -> "es_title"))
    val routed = Envelope.route(events, Seq(rule), cat)
    assert(routed.keySet == Set(("db", "adv")))
    val merged = CdcMerge.lastWriteWins(routed(("db", "adv")), Seq("id"))
    val got = merged.as[(Int, String, Double)].collect().toSet
    assert(got == Set((1, "hello2", 9.5)))
    assert(merged.columns.toSeq == Seq("id", "es_title", "score"))
  }

  test("PK-changing envelope update splits into delete(old) + insert(new)") {
    // reference river/sync.go:219-233: beforeID != afterID -> the update
    // acts as a delete of the old key plus an insert of the after image
    val events = envelope(
      (1L, "db", "adv", "I", Map("id" -> "1"),
        Map("id" -> "1", "title" -> "a", "score" -> "1.0")),
      (2L, "db", "adv", "I", Map("id" -> "5"),
        Map("id" -> "5", "title" -> "e", "score" -> "5.0")))
      .unionByName(
        // key-changing update 1 -> 2 carries BOTH images
        Seq((3L, "db", "adv", "U", Map("id" -> "2"),
          Map("id" -> "1", "title" -> "a", "score" -> "1.0"),
          Map("id" -> "2", "title" -> "a2", "score" -> "2.0")))
          .toDF("seq", "schema", "table", "op", "key", "before", "after")
          .withColumn("tsMs", $"seq")
          .select("seq", "schema", "table", "op", "key", "after",
            "tsMs", "before"))
    val cat = new Catalog()
    cat.register("db", "adv", advDef)
    val typed = Envelope.route(events,
      Seq(Rule("db", "adv", "sink", "adv")), cat)(("db", "adv"))
    val state = CdcMerge.lastWriteWins(typed, Seq("id"))
      .as[(Int, String, Double)].collect().toSet
    // old key 1 is GONE (no stale row), new key 2 holds the after image
    assert(state == Set((2, "a2", 2.0), (5, "e", 5.0)))
  }

  test("delete events surface their key from the key map") {
    val events = envelope(
      (1L, "db", "adv", "D", Map("id" -> "7"), null))
    val cat = new Catalog()
    cat.register("db", "adv", advDef)
    val typed = Envelope.toTyped(
      Envelope.forTable(events, "db", "adv"), advDef,
      Rule("db", "adv", "sink", "adv"))
    val row = typed.collect()(0)
    assert(row.getInt(0) == 7) // id restored from key map
    assert(row.isNullAt(1) && row.isNullAt(2))
  }

  test("list/date modifiers apply during envelope cast") {
    val defn = TableDef(StructType(Seq(
      StructField("id", IntegerType),
      StructField("tags", StringType),
      StructField("created", LongType))), Seq("id"))
    val events = envelope(
      (1L, "db", "t", "I", Map("id" -> "1"),
        Map("id" -> "1", "tags" -> "a,b", "created" -> "1500000000")))
    val cat = new Catalog()
    cat.register("db", "t", defn)
    val rule = Rule("db", "t", "s", "t", fieldMapping = Map(
      "tags" -> "taglist,list", "created" -> ",date"))
    val row = Envelope.toTyped(
      Envelope.forTable(events, "db", "t"), defn, rule).collect()(0)
    assert(row.getSeq[String](1) == Seq("a", "b"))
    assert(row.getTimestamp(2).toInstant.getEpochSecond == 1500000000L)
  }
}
