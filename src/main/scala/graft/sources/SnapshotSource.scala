package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bootstrap snapshot scan (S1): the full-table load that precedes the
  * change stream. The reference shells out to `mysqldump` and replays the
  * dump as insert events (reference: river/river.go:111-145); on Spark the
  * snapshot is a plain batch read — JDBC against a live source, parquet in
  * tests — and the CDC stream starts from the offset recorded at snapshot
  * time (ST7 hand-off, reference: river/river_test.go:262 WaitDumpDone).
  *
  * Scale: `partitionColumn/numPartitions` splits the JDBC read into range
  * predicates so the snapshot runs with full cluster parallelism instead
  * of one connection — the analog of the reference's single mysqldump
  * process, minus the bottleneck. Use the table's (numeric) primary key.
  */
object SnapshotSource {

  /** Parquet snapshot (the tested path — driver testdata). */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** JDBC snapshot with range-partitioned parallelism. Spec-proven
    * against embedded Derby (SnapshotSourceJdbcSpec): 4 non-empty range
    * splits over the key, filters pushed into the database. No MySQL in
    * this container, but the Spark JDBC contract is engine-agnostic. */
  def jdbc(spark: SparkSession, url: String, table: String,
      partitionColumn: Option[String] = None,
      lowerBound: Long = 0L, upperBound: Long = Long.MaxValue,
      numPartitions: Int = 32,
      options: Map[String, String] = Map.empty): DataFrame = {
    var reader = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    partitionColumn.foreach { pc =>
      reader = reader
        .option("partitionColumn", pc)
        .option("lowerBound", lowerBound)
        .option("upperBound", upperBound)
        .option("numPartitions", numPartitions)
    }
    options.foreach { case (k, v) => reader = reader.option(k, v) }
    reader.load()
  }
}
