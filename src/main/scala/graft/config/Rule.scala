package graft.config

/** Per-table mapping rule.
  *
  * Re-expression of the reference's `Rule{SourceSchema, SourceTable,
  * SinkSchema, SinkTable, FieldMapping, Filter}` (reference:
  * river/rule.go:9-23) plus the CLI mutation-ignore flags
  * (reference: clickhouse/client.go:240-243; README.md:29-40, default true —
  * i.e. insert-only is the reference's default production posture).
  *
  * `fieldMapping` values may carry a modifier suffix `"name,modifier"`
  * (reference: river/sync.go:317-332); the closed modifier set is `list`
  * (CSV string → array, river/sync.go:431-438) and `date` (unix seconds →
  * timestamp, river/sync.go:439-449).
  */
final case class Rule(
    sourceSchema: String,
    sourceTable: String,
    sinkSchema: String,
    sinkTable: String,
    /** Columns to keep; empty = all (the reference defaults to the sink
      * table's own columns, river/river.go:293-312). */
    filter: Seq[String] = Seq.empty,
    /** source column -> "sink column[,modifier]" */
    fieldMapping: Map[String, String] = Map.empty,
    /** Primary-key columns of the source table (composite supported). */
    pkColumns: Seq[String] = Seq.empty,
    /** How DECIMAL wire values on this rule's feed are encoded — the
      * per-rule analog of Debezium's `decimal.handling.mode`
      * ([[graft.functions.TypeNorm.DecimalModePrecise]] /
      * `Numeric` / `Auto`). A known feed should declare its mode;
      * `auto` sniffs per value with tightened guards (ADVICE r9). */
    decimalMode: String = "auto") {

  def key: String = Rule.ruleKey(sourceSchema, sourceTable)

  /** (sinkName, modifier) for a source column, fieldMapping applied. */
  def mappedField(sourceCol: String): (String, Option[String]) =
    fieldMapping.get(sourceCol) match {
      case Some(spec) =>
        spec.split(",", 2) match {
          case Array(name, mod) =>
            (if (name.isEmpty) sourceCol else name, Some(mod.trim))
          case Array(name) =>
            (if (name.isEmpty) sourceCol else name, None)
        }
      case None => (sourceCol, None)
    }

  /** Column-filter check (reference: river/rule.go:44-55 `CheckFilter`). */
  def passesFilter(col: String): Boolean =
    filter.isEmpty || filter.contains(col)
}

object Rule {
  def ruleKey(schema: String, table: String): String = s"$schema:$table"

  /** Wildcard-table validation, port of the reference's only unit-tested
    * pure functions (reference: river/river.go:355-371,
    * river/river_test.go:402-433). A source table spec is either a literal
    * name or a regex; a regex spec must be the only spec for its schema.
    */
  def isValidTables(tables: Seq[String]): Boolean =
    if (tables.length > 1) !tables.exists(_ == "*")
    else true

  def buildTable(table: String): String =
    if (table == "*") "." + table else table

  /** True when the table spec is a regex rather than a literal name
    * (reference detects this via regexp.QuoteMeta comparison,
    * river/river.go:196, 252). */
  def isRegexSpec(table: String): Boolean =
    table.exists(c => "\\.[]{}()*+?|^$".contains(c))

  /** Expand a wildcard table spec against a catalog listing (reference
    * expands against information_schema.tables with RLIKE,
    * river/river.go:196-221). */
  def expand(spec: String, catalogTables: Seq[String]): Seq[String] =
    if (!isRegexSpec(spec)) catalogTables.filter(_ == spec)
    else {
      val re = buildTable(spec).r
      catalogTables.filter(t => re.pattern.matcher(t).matches())
    }
}

/** Engine config ≅ the reference's TOML `Config`
  * (reference: river/config.go:18-51) reduced to what a Spark engine needs.
  */
final case class SyncConfig(
    rules: Seq[Rule],
    /** Drop update events before the sink (reference `-update` flag,
      * default true = ignore; clickhouse/client.go:273-275). Defaults
      * true to match the reference's insert-only production posture. */
    ignoreUpdates: Boolean = true,
    /** Drop delete events before the sink (reference `-delete` flag,
      * default true = ignore; clickhouse/client.go:252-254). */
    ignoreDeletes: Boolean = true,
    /** Reject tables without a PK unless set
      * (reference: river/river.go:283-291, river/config.go:50). */
    skipNoPkTable: Boolean = false,
    /** Micro-batch flush: max rows (reference bulk_size=128,
      * river/sync.go:117-120). */
    bulkSize: Int = 128,
    /** Micro-batch flush: max latency millis (reference flush_bulk_time
      * =200ms, river/sync.go:122-125). */
    flushIntervalMs: Long = 200L) {

  def ruleFor(schema: String, table: String): Option[Rule] =
    rules.find(r => r.sourceSchema == schema && r.sourceTable == table)
}
