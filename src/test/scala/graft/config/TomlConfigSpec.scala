package graft.config

import org.scalatest.funsuite.AnyFunSuite

class TomlConfigSpec extends AnyFunSuite {

  test("parses the reference's river.toml shape") {
    val cfg = TomlConfig.parse(
      """# reference-style config
        |my_addr = "127.0.0.1:3306"  # ignored connection key
        |bulk_size = 64
        |flush_bulk_time = "1ms"
        |skip_no_pk_table = true
        |skip_update = false
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
    assert(cfg.ignoreDeletes && !cfg.ignoreUpdates) // delete by default
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

  test("quoted booleans parse like bare ones") {
    // `skip_update = "true"` is legal TOML-ish; it must not silently
    // parse as false
    val cfg = TomlConfig.parse(
      """skip_update = "false"
        |skip_no_pk_table = "true"
        |""".stripMargin)
    assert(!cfg.ignoreUpdates)
    assert(cfg.skipNoPkTable)
  }

  test("defaults match the reference's code defaults") {
    val cfg = TomlConfig.parse("")
    assert(cfg.bulkSize == 128) // river/sync.go:117-120
    assert(cfg.flushIntervalMs == 200L) // river/sync.go:122-125
    assert(!cfg.skipNoPkTable)
    // -update/-delete CLI flags default true (insert-only posture,
    // clickhouse/client.go:240-243)
    assert(cfg.ignoreUpdates && cfg.ignoreDeletes)
  }

  test("parses the reference's canonical rule key names") {
    val cfg = TomlConfig.parse(
      """flush_bulk_time = "200ms"
        |
        |[[rule]]
        |source_schema = "niushop"
        |source_table = "adv"
        |sink_schema = "azmbk_com_db"
        |sink_table = "adv"
        |""".stripMargin)
    val r = cfg.ruleFor("niushop", "adv").get
    assert(r.sinkSchema == "azmbk_com_db" && r.sinkTable == "adv")
    assert(cfg.flushIntervalMs == 200L)
  }

  test("duration strings parse like Go time.ParseDuration") {
    assert(TomlConfig.durationMs("\"1ms\"") == 1L)
    assert(TomlConfig.durationMs("\"2s\"") == 2000L)
    assert(TomlConfig.durationMs("\"1m\"") == 60000L)
    assert(TomlConfig.durationMs("\"500us\"") == 1L) // rounds up
    assert(TomlConfig.durationMs("250") == 250L) // bare int = millis
    assert(TomlConfig.durationMs("\"0ms\"") == 0L) // AvailableNow sentinel
    intercept[IllegalArgumentException](TomlConfig.durationMs("\"oops\""))
  }

  test("a rule with no source schema/table fails loudly") {
    val bad =
      """[[rule]]
        |sink_schema = "s"
        |sink_table = "t"
        |""".stripMargin
    intercept[IllegalArgumentException](TomlConfig.parse(bad))
  }

  test("foreign-section keys do not leak into top-level config") {
    val cfg = TomlConfig.parse(
      """bulk_size = 32
        |
        |[[source]]
        |schema = "test"
        |tables = ["t1"]
        |skip_update = false
        |""".stripMargin)
    assert(cfg.bulkSize == 32)
    // skip_update inside [[source]] must not flip the top-level default
    assert(cfg.ignoreUpdates)
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
