package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** The `events` table's `ts` column, independent of the parquet writer's
  * timestamp encoding. The generated fixture has shipped it two ways:
  *
  *   - TIMESTAMP(NANOS), which Spark can only surface as a raw long via
  *     `spark.sql.legacy.parquet.nanosAsLong=true` (the data is
  *     µs-granular, so integer-dividing by 1000 is lossless);
  *   - native TIMESTAMP(MICROS), surfaced as TIMESTAMP or
  *     TIMESTAMP_NTZ.
  *
  * Every reader goes through these helpers so a regenerated fixture
  * never breaks query code. All sessions run with UTC as the session
  * time zone, making the NTZ→TZ cast a numeric no-op.
  */
object EventTs {

  /** `ts` as a session-TZ TIMESTAMP (µs precision). */
  def asTimestamp(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType => timestamp_micros(expr("ts div 1000"))
    case TimestampNTZType => col("ts").cast(TimestampType)
    case _ => col("ts")
  }

  /** `ts` as epoch microseconds (long). */
  def asMicros(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType => expr("ts div 1000")
    case _ => unix_micros(col("ts").cast(TimestampType))
  }
}
