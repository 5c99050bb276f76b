package graft.model

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.types.StructType

import scala.jdk.CollectionConverters._

/** Table metadata: schema + primary key, the unit the reference fetches
  * live per table (`canal.GetTable`, reference: river/river.go:279-292) and
  * refreshes on DDL (reference: river/sync.go:54-60). */
final case class TableDef(
    schema: StructType,
    pkColumns: Seq[String]) {
  require(pkColumns.forall(schema.fieldNames.contains),
    s"pk columns ${pkColumns.mkString(",")} not all present in schema")
}

/** Runtime schema registry: the engine-side stand-in for the source's
  * information_schema. Rules resolve their TableInfo here at prepare time
  * (reference: river/river.go:238-317) and re-resolve after a DDL event
  * (ST6) — `refresh` swaps the entry atomically so in-flight micro-batches
  * keep the TableDef they started with while the next batch sees the new
  * one.
  *
  * Tables without a primary key are rejected at registration unless
  * `skipNoPkTable` (reference: river/river.go:283-291, config
  * river/config.go:50); rejected tables are simply absent, so the router
  * drops their events (P6 semantics).
  */
final class Catalog(skipNoPkTable: Boolean = false) {
  private val tables = new ConcurrentHashMap[(String, String), TableDef]()

  /** Register/refresh a table. Returns false if rejected for missing PK. */
  def register(schema: String, table: String, defn: TableDef): Boolean =
    if (defn.pkColumns.isEmpty) {
      if (skipNoPkTable) false
      else throw new IllegalArgumentException(
        s"table $schema.$table has no primary key " +
          "(set skipNoPkTable to drop such tables instead)")
    } else {
      tables.put((schema, table), defn)
      true
    }

  def refresh(schema: String, table: String, defn: TableDef): Boolean =
    register(schema, table, defn)

  /** Remove a table (wire-driven DROP TABLE). Returns false if absent. */
  def drop(schema: String, table: String): Boolean =
    tables.remove((schema, table)) != null

  def get(schema: String, table: String): Option[TableDef] =
    Option(tables.get((schema, table)))

  /** All table names in a schema — the listing wildcard rules expand
    * against (reference: river/river.go:196-221). */
  def tableNames(schema: String): Seq[String] =
    tables.keySet.asScala.toSeq.collect {
      case (s, t) if s == schema => t
    }.sorted
}
