package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wide↔long reshaping of aggregate frames — the pivot/melt pair every
  * reporting layer runs over the synced table (the reference leaves
  * this to ClickHouse's query-time `sumIf`/`-Map` combinators; SURVEY
  * §2 maps no reshape operator, so this is engine surface).
  *
  * Shape (the 100 TB argument): `pivot` takes the VALUE LIST
  * explicitly. Spark's implicit-values overload runs a full
  * distinct-scan job over the pivot column before the plan even
  * builds — a corpus-sized pre-pass at 100 TB, and a schema that
  * changes under the caller's feet when new codes appear. With the
  * contract declared, a pivot is ONE aggregate shuffle (map-side
  * partials included) into a fixed schema: each pivot value compiles
  * to a conditional aggregate over the same groupBy exchange.
  * `melt` is `unpivot` — scan-local row explosion, zero shuffles. */
object Reshape {

  /** Wide pivot: one row per `rowKeys`, one column per declared
    * `values` of `pivotCol`, cells = `agg` over the matching rows.
    * Absent (group, value) cells stay null, exactly like the
    * conditional-aggregate SQL spelling. */
  def pivot(df: DataFrame, rowKeys: Seq[String], pivotCol: String,
      values: Seq[String], agg: Column): DataFrame =
    df.groupBy(rowKeys.map(col): _*).pivot(pivotCol, values).agg(agg)

  /** Long melt: `ids` kept, each column of `valueCols` emitted as a
    * (`varName` = column name, `valName` = cell) row — Spark's native
    * `unpivot`, a scan-local generator (no shuffle, no UDF). */
  def melt(df: DataFrame, ids: Seq[String], valueCols: Seq[String],
      varName: String, valName: String): DataFrame =
    df.unpivot(ids.map(col).toArray, valueCols.map(col).toArray,
      varName, valName)
}
