package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MySQL-value normalization as pure `Column => Column` transforms.
  *
  * Re-expresses the reference's runtime value conversion
  * `makeReqColumnData` (reference: river/sync.go:242-315) and the
  * field-modifier casts (reference: river/sync.go:428-455) as Catalyst
  * built-in expressions — every transform here stays inside whole-stage
  * codegen (no UDFs).
  */
object TypeNorm {

  /** ENUM: binlog delivers a 1-based int64 index; map to its label,
    * out-of-range index → "" with the reference's warn-and-continue
    * semantics (reference: river/sync.go:244-256).
    */
  def enumLabel(idx: Column, labels: Seq[String]): Column = {
    val arr = array(labels.map(lit): _*)
    when(idx >= 1 && idx <= labels.size, element_at(arr, idx.cast("int")))
      .otherwise(lit(""))
  }

  /** SET: binlog delivers an int64 bitmask; decode to the comma-joined
    * member labels, bit i ↔ labels(i) (reference: river/sync.go:257-269).
    */
  def setLabels(mask: Column, labels: Seq[String]): Column = {
    val members = labels.zipWithIndex.map { case (label, i) =>
      when(mask.bitwiseAND(lit(1L << i)) =!= 0L, lit(label))
        .otherwise(lit(null: String))
    }
    array_join(filter(array(members: _*), c => c.isNotNull), ",")
  }

  /** BIT(1): the dump path delivers the string "\x01"/"" while the binlog
    * path already delivers int64 (reference: river/sync.go:270-280).
    * Normalize either representation to 0/1 long.
    */
  def bitToLong(c: Column): Column =
    when(c.cast("string").isin("", "0", "\u0000"), 0L).otherwise(1L)

  /** DATE: parse "yyyy-MM-dd"; MySQL zero-date sentinel `0000-00-00` (or a
    * parse failure) → NULL — mandatory semantics, guarded in the reference
    * at both transform and sink (reference: river/sync.go:303-311;
    * clickhouse/client.go:181-184, 284-287). A bare integer is Debezium's
    * `io.debezium.time.Date` wire encoding — days since the epoch.
    */
  def mysqlDate(c: Column): Column =
    when(c === "0000-00-00", lit(null).cast("date"))
      .when(c.rlike("^-?[0-9]+$"),
        date_add(to_date(lit("1970-01-01")), c.cast("int")))
      .otherwise(try_to_timestamp(c, lit("yyyy-MM-dd")).cast("date"))

  /** DATETIME with the zero sentinel `0000-00-00 00:00:00` → NULL
    * (reference: clickhouse/client.go:186-191). Debezium wire encodings
    * are also recognized: a bare integer is epoch millis
    * (`io.debezium.time.Timestamp`) or epoch micros (`MicroTimestamp`,
    * DATETIME(n>0) under adaptive precision) — disambiguated by
    * magnitude (≥ 2×10¹³ is micros: that bound is year 2603 as millis
    * but already Aug 1970 as micros, so every realistic value sits on
    * one side); an ISO-8601 `T`/offset string is MySQL TIMESTAMP's
    * `ZonedTimestamp`. */
  def mysqlDateTime(c: Column): Column =
    when(c.startsWith("0000-00-00"), lit(null).cast("timestamp"))
      .when(c.rlike("^-?[0-9]+$"),
        when(abs(c.cast("long")) >= 20000000000000L,
          timestamp_micros(c.cast("long")))
          .otherwise(timestamp_millis(c.cast("long"))))
      .when(c.contains("T"), c.cast("timestamp"))
      .otherwise(try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss")))

  /** DECIMAL/NUMERIC (and unsigned BIGINT) from a change feed: a plain
    * numeric string casts directly (`decimal.handling.mode=string` /
    * `double`, the dump path, and the engine's own feeds), while
    * anything else is Debezium's default precise mode — base64 of the
    * Kafka Connect `Decimal` two's-complement unscaled bytes, decoded
    * in-plan by the native `connect_decimal` kernel at the TARGET
    * column's scale (the registry scale and the connect-schema scale
    * are both the MySQL column's declared scale). */
  def connectDecimal(c: Column,
      target: org.apache.spark.sql.types.DecimalType): Column =
    when(c.rlike("^[+-]?[0-9]*\\.?[0-9]+([eE][+-]?[0-9]+)?$"),
      c.cast(target))
      .otherwise(call_function("connect_decimal", unbase64(c),
        lit(target.scale)).cast(target))

  /** `list` field modifier: CSV string → array<string>
    * (reference: river/sync.go:26, 431-438). */
  def csvList(c: Column): Column = split(c, ",")

  /** `date` field modifier: integer unix seconds → timestamp
    * (reference: river/sync.go:29, 439-449). */
  def unixSecondsToTs(c: Column): Column = timestamp_seconds(c.cast("long"))

  /** JSON stays dynamic in the reference (parsed to an untyped value,
    * unparseable → raw passthrough, river/sync.go:286-297); on Spark the
    * idiomatic equivalent is to keep the string and project paths on
    * demand. */
  def jsonGet(c: Column, path: String): Column = get_json_object(c, path)

  /** Bytes → UTF-8 string (reference: river/sync.go:281-285). */
  def bytesToString(c: Column): Column = c.cast("string")

  /** Lenient string → int64 (reference `StrToInt64`,
    * clickhouse/client.go:234-237 — fixed here: the reference truncates via
    * platform `int`). */
  def strToLong(c: Column): Column = c.cast("long")
}
