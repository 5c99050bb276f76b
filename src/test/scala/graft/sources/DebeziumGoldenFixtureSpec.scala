package graft.sources

import java.time.Instant

import graft.TestSpark
import graft.config.Rule
import graft.model.Catalog
import graft.operators.{CdcMerge, Envelope}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden-fixture run of a realistic captured Debezium stream
  * (src/test/resources/debezium/mixed_feed.jsonl): wrapped envelopes
  * with `decimal.handling.mode=precise` base64 DECIMAL payloads,
  * epoch-day DATE ints, micro/milli epoch DATETIME longs, ZonedTimestamp
  * strings, an interleaved heartbeat, a tombstone, and two schema-change
  * events (structured-`tableChanges` CREATE, bare-DDL ALTER) — the wire
  * shapes the synthesized-JSON specs can't catch (reference behavior
  * being matched: river/sync.go:242-315 type conversions on the binlog
  * path). The whole feed flows ingest → route → typed LWW state and is
  * checked against a hand-computed oracle, value for value. */
class DebeziumGoldenFixtureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  private def fixture = {
    val url = getClass.getResource("/debezium/mixed_feed.jsonl")
    assert(url != null, "fixture missing from test resources")
    spark.read.text(url.toString)
  }

  test("captured-stream fixture lands the hand-computed typed LWW state") {
    val catalog = new Catalog()
    val events = DebeziumSource.ingest(fixture, catalog)

    // wire-driven DDL: CREATE (structured tableChanges) then a
    // multi-clause ALTER (bare ddl) both applied — the registry ends
    // with 9 columns
    val defn = catalog.get("inventory", "products")
      .getOrElse(fail("CREATE TABLE schema change not applied"))
    assert(defn.pkColumns == Seq("id"))
    assert(defn.schema.fieldNames.toSeq == Seq("id", "name", "price",
      "added", "updated_at", "created_at", "stock", "discount",
      "shipped"))

    val rule = Rule("inventory", "products", "inventory", "products")
    val typed = Envelope.toTyped(
      Envelope.splitKeyChanges(
        Envelope.forTable(events, "inventory", "products"),
        defn.pkColumns),
      defn, rule)
    val state = CdcMerge.latestByKey(typed, defn.pkColumns)
      .filter(col("_op") =!= "D").drop("_op", "_seq")
      .orderBy("id").collect()

    // heartbeat + tombstone dropped; id=2 deleted; id=1 shows its
    // update; ids 1,3 predate the ALTER -> null discount
    assert(state.map(_.getInt(0)).toSeq == Seq(1, 3, 4))
    def dec(s: String) = new java.math.BigDecimal(s)
    val Seq(r1, r3, r4) = state.toSeq
    assert(r1.getString(1) == "widget-v2")
    assert(r1.getDecimal(2).compareTo(dec("-5.25")) == 0)
    assert(r1.getDate(3).toString == "2026-08-13")
    assert(r1.getTimestamp(4).toInstant ==
      // micros wire long: datetime(6)'s declared fsp pins the decode
      Instant.ofEpochSecond(1786606200L, 123456000L))
    assert(r1.getTimestamp(5).toInstant ==
      Instant.parse("2026-08-13T09:00:00Z")) // ZonedTimestamp string
    assert(r1.getDecimal(6).compareTo(
      dec("18446744073709551615")) == 0) // max uint64 via base64 bytes
    assert(r1.isNullAt(7))
    assert(r1.isNullAt(8)) // predates the ALTER

    assert(r3.getString(1) == "sprocket")
    assert(r3.getDecimal(2).compareTo(dec("1234567.89")) == 0)
    assert(r3.getDate(3).toString == "1969-12-31") // epoch day -1
    assert(r3.getTimestamp(4).toInstant ==
      Instant.parse("2026-08-13T09:00:00Z")) // micros wire long
    assert(r3.getDecimal(6).compareTo(dec("4200")) == 0)
    assert(r3.isNullAt(7))
    assert(r3.isNullAt(8))

    assert(r4.getString(1) == "doohickey")
    assert(r4.getDecimal(2).compareTo(dec("19.99")) == 0)
    assert(r4.getDecimal(6).compareTo(dec("1")) == 0)
    assert(r4.getDecimal(7).compareTo(dec("0.125")) == 0) // post-ALTER
    assert(r4.getTimestamp(8).toInstant ==
      // millis wire long: datetime(3) declares fsp<=3 -> Timestamp
      Instant.ofEpochSecond(1786606200L, 123000000L))

    // zero-date sentinel & plain-string decimals still take the
    // non-precise path (handling.mode=string / the engine's own feeds)
    import spark.implicits._
    val mixed = Seq(("12.34", "0000-00-00", "2026-01-02"))
      .toDF("d", "z", "s")
    val got = mixed.select(
      graft.functions.TypeNorm.connectDecimal($"d",
        org.apache.spark.sql.types.DecimalType(10, 2)).as("d"),
      graft.functions.TypeNorm.mysqlDate($"z").as("z"),
      graft.functions.TypeNorm.mysqlDate($"s").as("s")).collect()(0)
    assert(got.getDecimal(0).compareTo(dec("12.34")) == 0)
    assert(got.isNullAt(1))
    assert(got.getDate(2).toString == "2026-01-02")
  }

  test("scale-0 DECIMAL precise feed: the declared per-rule mode decodes " +
      "where auto would mis-read") {
    // 'auto''s residual ambiguity (TypeNorm): a scale-0 target keeps
    // the plain-numeric preference, so a precise-mode payload whose
    // base64 text is digit-only would cast as that number. "1234" is
    // exactly such a payload: as Connect Decimal bytes it is
    // 0xD76DF8 = -2658824, as a numeric string it is 1234. The
    // per-rule DecimalModePrecise knob must reach the wire path and
    // pick the bytes reading end-to-end.
    import spark.implicits._
    val feed = Seq(
      """{"schema": {"type": "struct", "name": "io.debezium.connector.mysql.SchemaChangeValue"}, "payload": {"source": {"db": "inventory", "file": "mysql-bin.000009", "pos": 100}, "databaseName": "inventory", "ddl": "CREATE TABLE counters (id int NOT NULL, qty decimal(10,0), PRIMARY KEY (id))"}}""",
      """{"schema": {"type": "struct", "name": "inventory.counters.Envelope"}, "payload": {"before": null, "after": {"id": 1, "qty": "1234"}, "source": {"db": "inventory", "table": "counters", "file": "mysql-bin.000009", "pos": 200, "ts_ms": 1786606200000}, "op": "c", "ts_ms": 1786606200900}}"""
    ).toDF("value")
    val catalog = new Catalog()
    val events = DebeziumSource.ingest(feed, catalog)
    val defn = catalog.get("inventory", "counters")
      .getOrElse(fail("CREATE TABLE schema change not applied"))
    def stateWith(rule: Rule) = CdcMerge.latestByKey(
      Envelope.toTyped(
        Envelope.splitKeyChanges(
          Envelope.forTable(events, "inventory", "counters"),
          defn.pkColumns),
        defn, rule),
      defn.pkColumns).filter(col("_op") =!= "D").drop("_op", "_seq")
    def dec(s: String) = new java.math.BigDecimal(s)
    val precise = Rule("inventory", "counters", "inventory", "counters",
      decimalMode = graft.functions.TypeNorm.DecimalModePrecise)
    val gotPrecise = stateWith(precise).collect()(0)
    assert(gotPrecise.getDecimal(1).compareTo(dec("-2658824")) == 0)
    // and the documented auto behavior on the same wire bytes: the
    // digit-only text wins the scale-0 numeric preference — the
    // mis-read the declared mode exists to prevent
    val gotAuto = stateWith(
      Rule("inventory", "counters", "inventory", "counters")).collect()(0)
    assert(gotAuto.getDecimal(1).compareTo(dec("1234")) == 0)
  }
}
