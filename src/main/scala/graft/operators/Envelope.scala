package graft.operators

import graft.config.Rule
import graft.model.{Catalog, ChangeEvent, TableDef}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The generic change-event envelope path (SURVEY §1.2): schemas are
  * runtime-discovered, so a single untyped stream of [[ChangeEvent]]s
  * (string-encoded values in `before`/`after` maps, exactly the
  * reference's `map[string]interface{}` request shape,
  * clickhouse/client.go:62-70) carries EVERY table; per-table typed
  * DataFrames are projected out by casting against the registry schema at
  * plan-build time.
  *
  * This is the engine's answer to the reference's interpretive per-row
  * rule application (river/sync.go:334-383): the rule + TableDef compile
  * once into a `select` of `after[col] :: type` casts — whole-stage
  * codegen'd, re-compiled only when the registry refreshes (ST6).
  */
object Envelope {
  import ChangeEvent.{OpCol, SeqCol}

  /** Route predicate (P6): keep one table's events; unruled tables are
    * dropped by simply never being projected. */
  def forTable(events: DataFrame, schema: String, table: String): DataFrame =
    events.filter(col("schema") === schema && col("table") === table)

  /** Typed after-image projection: envelope → the table's own columns
    * (rule filter + rename applied, values cast from their string
    * encoding to the registry types). Delete events keep key columns
    * (from `key`) and null payloads, ready for [[CdcMerge]]. */
  def toTyped(events: DataFrame, defn: TableDef, rule: Rule): DataFrame = {
    val cols: Seq[Column] = defn.schema.fields.toSeq
      .filter(f => rule.passesFilter(f.name))
      .map { f =>
        val (sinkName, modifier) = rule.mappedField(f.name)
        val raw =
          if (defn.pkColumns.contains(f.name)) {
            // keys ride in `key` for every op (deletes have no after)
            coalesce(element_at(col("after"), f.name),
              element_at(col("key"), f.name))
          } else element_at(col("after"), f.name)
        val typed = modifier match {
          case Some("list") => graft.functions.TypeNorm.csvList(raw)
          case Some("date") => graft.functions.TypeNorm.unixSecondsToTs(raw)
          case _ => normalize(raw, f, rule.decimalMode)
        }
        typed.as(sinkName)
      }
    events.select(cols :+ col("op").as(OpCol) :+ col("seq").as(SeqCol): _*)
  }

  /** MySQL wire-value normalization driven by the field's
    * [[graft.functions.TypeMapper]] metadata — the engine-side
    * `makeReqColumnData` (reference: river/sync.go:242-315): ENUM binlog
    * index → label, SET bitmask → joined members, BIT dump-string → 0/1,
    * zero dates → NULL. Fields without MySQL metadata take a plain cast.
    */
  private def normalize(raw: Column,
      f: org.apache.spark.sql.types.StructField,
      decimalMode: String): Column = {
    import graft.functions.{TypeMapper, TypeNorm}
    if (!f.metadata.contains(TypeMapper.MysqlTypeKey)) raw.cast(f.dataType)
    else f.metadata.getString(TypeMapper.MysqlTypeKey) match {
      case "enum" => TypeNorm.enumLabel(raw.cast("long"),
        f.metadata.getStringArray(TypeMapper.EnumValuesKey).toSeq)
      case "set" => TypeNorm.setLabels(raw.cast("long"),
        f.metadata.getStringArray(TypeMapper.SetValuesKey).toSeq)
      case "bit" => TypeNorm.bitToLong(raw)
      case "date" => TypeNorm.mysqlDate(raw)
      case "datetime" => TypeNorm.mysqlDateTime(raw,
        // the registry's declared fsp pins the millis/micros wire
        // decode; absent -> the decoder's magnitude fallback
        if (f.metadata.contains(TypeMapper.FspKey))
          Some(f.metadata.getLong(TypeMapper.FspKey).toInt)
        else None)
      case "decimal" => TypeNorm.connectDecimal(raw,
        f.dataType.asInstanceOf[org.apache.spark.sql.types.DecimalType],
        decimalMode)
      case _ => raw.cast(f.dataType) // json et al stay dynamic
    }
  }

  /** PK-change split for ENVELOPE updates (S8's second half, mirrored
    * from the typed path's [[CdcMerge.normalizeUpdates]]): an update
    * whose before/after primary key differs acts as delete(old key) +
    * insert(new key) — the reference detects `beforeID != afterID` and
    * emits exactly that pair (river/sync.go:219-233, asserted
    * river/river_test.go:320, 355-360). Without the split the merge
    * would upsert the new key and leave a STALE row under the old key.
    * All sequence numbers map monotonically (stable events seq*2+1,
    * delete half seq*2, insert half seq*2+1) so the delete ranks just
    * below its paired insert and a same-key re-insert beats it. */
  def splitKeyChanges(events: DataFrame, pkCols: Seq[String]): DataFrame = {
    val changed = pkCols.map(k =>
      not(element_at(col("before"), k) <=> element_at(col("after"), k)))
      .reduce(_ || _)
    val isSplit = col("op") === ChangeEvent.OpUpdate &&
      col("before").isNotNull && changed
    // ONE scan + explode, not a 3-branch union (which would read a
    // 100 TB envelope log three times): each row becomes 1 or 2 events
    def ev(seq: Column, op: Column, key: Column,
        after: Column): Column =
      struct(seq.as("seq"), col("tsMs").as("tsMs"),
        col("schema").as("schema"), col("table").as("table"),
        op.as("op"), key.as("key"), col("before").as("before"),
        after.as("after"))
    val stable = ev(col("seq") * 2 + 1, col("op"), col("key"),
      col("after"))
    val del = ev(col("seq") * 2, lit(ChangeEvent.OpDelete),
      col("before"), lit(null).cast("map<string,string>"))
    val ins = ev(col("seq") * 2 + 1, lit(ChangeEvent.OpInsert),
      col("after"), col("after"))
    events
      .select(explode(when(isSplit, array(del, ins))
        .otherwise(array(stable))).as("_e"))
      .select(col("_e.*"))
  }

  /** Full route: envelope stream × config rules × catalog → one typed,
    * merge-ready DataFrame per ruled (schema, table), PK-changing
    * updates split per the reference's semantics. */
  def route(events: DataFrame, rules: Seq[Rule],
      catalog: Catalog): Map[(String, String), DataFrame] =
    rules.flatMap { r =>
      catalog.get(r.sourceSchema, r.sourceTable).map { defn =>
        (r.sourceSchema, r.sourceTable) ->
          toTyped(splitKeyChanges(
            forTable(events, r.sourceSchema, r.sourceTable),
            defn.pkColumns), defn, r)
      }
    }.toMap
}
