package graft.config

import org.scalatest.funsuite.AnyFunSuite

class TomlConfigSpec extends AnyFunSuite {

  test("parses the reference's river.toml shape") {
    val cfg = TomlConfig.parse(
      """# reference-style config
        |my_addr = "127.0.0.1:3306"  # ignored connection key
        |bulk_size = 64
        |flush_bulk_time = 1
        |skip_no_pk_table = true
        |skip_delete = true
        |
        |[[source]]
        |schema = "test"
        |tables = ["t1", "t2"]
        |
        |[[rule]]
        |schema = "test"
        |table = "t1"
        |ck_schema = "sink"
        |ck_table = "t1_sink"
        |filter = ["id", "title", "tags"]
        |id = ["id"]
        |  [rule.field]
        |  title = "es_title"
        |  tags = "taglist,list"
        |
        |[[rule]]
        |schema = "test"
        |table = "t2"
        |ck_schema = "sink"
        |ck_table = "t2_sink"
        |id = ["k1", "k2"]
        |""".stripMargin)
    assert(cfg.bulkSize == 64)
    assert(cfg.flushIntervalMs == 1L)
    assert(cfg.skipNoPkTable)
    assert(cfg.ignoreDeletes && !cfg.ignoreUpdates)
    assert(cfg.rules.size == 2)
    val r1 = cfg.ruleFor("test", "t1").get
    assert(r1.sinkTable == "t1_sink")
    assert(r1.filter == Seq("id", "title", "tags"))
    assert(r1.pkColumns == Seq("id"))
    assert(r1.mappedField("title") == (("es_title", None)))
    assert(r1.mappedField("tags") == (("taglist", Some("list"))))
    val r2 = cfg.ruleFor("test", "t2").get
    assert(r2.pkColumns == Seq("k1", "k2")) // composite PK config
    assert(r2.filter.isEmpty && r2.fieldMapping.isEmpty)
  }

  test("defaults match the reference's code defaults") {
    val cfg = TomlConfig.parse("")
    assert(cfg.bulkSize == 128) // river/sync.go:117-120
    assert(cfg.flushIntervalMs == 200L) // river/sync.go:122-125
    assert(!cfg.skipNoPkTable && !cfg.ignoreUpdates && !cfg.ignoreDeletes)
  }

  test("comments inside strings survive") {
    val cfg = TomlConfig.parse(
      """[[rule]]
        |schema = "a#b"
        |table = "t"
        |ck_schema = "s"
        |ck_table = "t"
        |""".stripMargin)
    assert(cfg.rules.head.sourceSchema == "a#b")
  }
}
