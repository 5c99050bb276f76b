package graft.sources

import org.apache.spark.sql.DataFrame

/** JDBC batch sink — the reference's database-write side (S6-S8): a
  * prepared `INSERT INTO t (cols) VALUES (?…)` loop inside one
  * transaction per flush (clickhouse/client.go:129-230). Spark's JDBC
  * writer is the distributed analog: each partition opens one
  * connection and flushes prepared-statement batches of `batchSize`
  * rows, so a 1000-partition write is 1000 parallel bulk loaders where
  * the reference had one.
  *
  * Mutations (the reference's per-row `ALTER TABLE … UPDATE/DELETE`,
  * clickhouse/client.go:249-335) don't map to a sane distributed
  * per-row statement loop; the engine's CDC path instead maintains the
  * collapsed last-write-wins state (CdcMerge/CdcStream) and REPLACES
  * the sink table with it — the ReplacingMergeTree posture: the sink
  * always holds the collapsed view, and replace is idempotent where a
  * mutation replay is not.
  */
object JdbcSink {

  /** Append `df` to a JDBC table (created if absent) — the S6
    * batch-insert path. */
  def append(df: DataFrame, url: String, table: String,
      batchSize: Int = 1000,
      options: Map[String, String] = Map.empty): Unit =
    writer(df, batchSize, options)
      .option("url", url).option("dbtable", table)
      .mode("append").save()

  /** Replace the sink table's contents with `df` — the merge-apply
    * path: write the CDC-collapsed state, atomically from the reader's
    * view per partition batch. `truncate = true` keeps the existing
    * table definition (and any grants/indexes) instead of drop+create
    * when the schema is unchanged. */
  def replace(df: DataFrame, url: String, table: String,
      batchSize: Int = 1000, truncate: Boolean = false,
      options: Map[String, String] = Map.empty): Unit =
    writer(df, batchSize, options)
      .option("url", url).option("dbtable", table)
      .option("truncate", truncate.toString)
      .mode("overwrite").save()

  private def writer(df: DataFrame, batchSize: Int,
      options: Map[String, String]) = {
    require(batchSize > 0, "JdbcSink: batchSize must be positive")
    var w = df.write.format("jdbc")
      .option("batchsize", batchSize)
    options.foreach { case (k, v) => w = w.option(k, v) }
    w
  }
}
