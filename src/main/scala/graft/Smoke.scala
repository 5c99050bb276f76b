package graft

import org.apache.spark.sql.SparkSession

/** Driver-contract smoke: SparkEntry.entry must return rows > 0 on
  * sf0.001 under a plain session (no extensions pre-registered) — the
  * driver builds its own session, so entry() must not rely on ours. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"entry rows: $n")
    require(n > 0, "entry must return rows")
    spark.stop()
  }
}
