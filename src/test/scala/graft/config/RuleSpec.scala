package graft.config

import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference's only compiling unit tests (wildcard
  * validation/build, reference: river/river_test.go:402-433) plus the
  * field-mapping parse rules. */
class RuleSpec extends AnyFunSuite {

  test("mappedField: plain rename") {
    val r = Rule("s", "t", "ss", "st",
      fieldMapping = Map("title" -> "es_title"))
    assert(r.mappedField("title") == (("es_title", None)))
    assert(r.mappedField("other") == (("other", None)))
  }

  test("mappedField: modifier suffix, empty rename keeps source name") {
    val r = Rule("s", "t", "ss", "st", fieldMapping = Map(
      "tags" -> "taglist,list",
      "created" -> ",date"))
    assert(r.mappedField("tags") == (("taglist", Some("list"))))
    assert(r.mappedField("created") == (("created", Some("date"))))
  }

  test("passesFilter: empty filter keeps everything") {
    val r = Rule("s", "t", "ss", "st")
    assert(r.passesFilter("anything"))
    val filtered = r.copy(filter = Seq("a", "b"))
    assert(filtered.passesFilter("a") && !filtered.passesFilter("c"))
  }

  test("isValidTables: wildcard must be alone (reference TestTableValidation)") {
    assert(Rule.isValidTables(Seq("*")))
    assert(Rule.isValidTables(Seq("t1", "t2")))
    assert(!Rule.isValidTables(Seq("*", "t2")))
  }

  test("buildTable: bare wildcard becomes regex (reference TestBuildTable)") {
    assert(Rule.buildTable("*") == ".*")
    assert(Rule.buildTable("my_table") == "my_table")
  }

  test("expand: literal vs regex specs against a catalog") {
    val catalog = Seq("t2024_01", "t2024_02", "other")
    assert(Rule.expand("other", catalog) == Seq("other"))
    assert(Rule.expand("t2024_.*", catalog) == Seq("t2024_01", "t2024_02"))
    assert(Rule.expand("missing", catalog).isEmpty)
  }

  test("ruleFor routes by (schema, table)") {
    val cfg = SyncConfig(rules = Seq(Rule("db", "a", "s", "a")))
    assert(cfg.ruleFor("db", "a").nonEmpty)
    assert(cfg.ruleFor("db", "b").isEmpty)
  }
}
