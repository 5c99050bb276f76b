package graft.operators

import graft.config.Rule
import graft.functions.TypeNorm
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule → declarative projection: column filter → rename → modifier cast.
  *
  * The reference applies these interpretively per row while building each
  * request (filter reference: river/sync.go:339-341; rename
  * river/sync.go:342-352; modifiers river/sync.go:428-455). Here the rule
  * compiles ONCE into a `select` so Catalyst gets a static plan — column
  * pruning reaches the parquet scan and every transform is codegen'd.
  */
object Projection {

  /** Compile a rule into the list of projected columns. */
  def columns(rule: Rule, sourceCols: Seq[String]): Seq[Column] =
    sourceCols.filter(rule.passesFilter).map { src =>
      val (sinkName, modifier) = rule.mappedField(src)
      val base = col(src)
      val transformed = modifier match {
        case Some("list") => TypeNorm.csvList(base)
        case Some("date") => TypeNorm.unixSecondsToTs(base)
        case Some(other) =>
          throw new IllegalArgumentException(
            s"unknown field modifier '$other' for column $src " +
              "(reference supports: list, date)")
        case None => base
      }
      transformed.as(sinkName)
    }

  /** Apply a rule's projection to a DataFrame. */
  def apply(rule: Rule)(df: DataFrame): DataFrame =
    df.select(columns(rule, df.columns.toSeq): _*)

  /** S5: when a rule has no explicit filter, the sink table's own columns
    * define the default projection (reference queries system.columns,
    * river/river.go:293-312). Sink names are matched after rename, so a
    * renamed source column is kept iff its sink-side name exists; an
    * explicit rule filter takes precedence. */
  def forSink(rule: Rule, sinkCols: Seq[String])(df: DataFrame): DataFrame = {
    val sinkSet = sinkCols.toSet
    val cols = df.columns.toSeq
      .filter(rule.passesFilter)
      .filter(src => rule.filter.nonEmpty ||
        sinkSet.contains(rule.mappedField(src)._1))
    df.select(columns(rule, cols): _*)
  }

  /** Sink-column DISCOVERY: read the sink table's own schema and use it
    * as the default projection — the engine-side `SELECT name FROM
    * system.columns WHERE database = ? AND table = ?` (reference:
    * river/river.go:293-312). For a parquet sink the schema read is a
    * footer-only metadata operation, no data scan. Returns None when the
    * sink does not exist yet (first sync: every source column flows). */
  def discoverSinkColumns(spark: org.apache.spark.sql.SparkSession,
      sinkDir: String): Option[Seq[String]] =
    try Some(spark.read.parquet(sinkDir).schema.fieldNames.toSeq)
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getErrorClass == "PATH_NOT_FOUND" => None
    }

  /** [[forSink]] with the column list discovered from the sink directory
    * itself; a missing sink falls back to the plain rule projection. */
  def forSinkDir(rule: Rule, sinkDir: String)(df: DataFrame): DataFrame =
    discoverSinkColumns(df.sparkSession, sinkDir) match {
      case Some(cols) => forSink(rule, cols)(df)
      case None => apply(rule)(df)
    }
}
