package graft.model

import org.apache.spark.sql.types._

/** Engine-wide change-event envelope.
  *
  * Mirrors the reference's dataflow unit — `canal.RowsEvent{Table, Action,
  * Rows}` (reference: river/sync.go:72-102) flattened to one event per row,
  * and the post-transform `BulkRequest{Action, Schema, Table, Data, PkName,
  * PkValue}` (reference: clickhouse/client.go:62-70).
  *
  * Differences from the reference, by design:
  *   - `seq` is a monotonic per-source sequence number. The reference gets
  *     global ordering for free from its single binlog reader + single sync
  *     goroutine (river/river.go:43-52); a distributed engine must carry the
  *     order explicitly so that last-write-wins merges are deterministic
  *     under any partitioning.
  *   - composite keys are first-class (`key` holds every PK column). The
  *     reference's `getDocID` keeps only the first map entry
  *     (river/sync.go:402-410) — a nondeterminism bug we deliberately fix.
  *   - values ride as strings in the generic envelope (schemas are
  *     runtime-discovered, reference river/river.go:279-292); typed pipelines
  *     skip the envelope and use the table's own StructType with `_op`/`_seq`
  *     meta columns (see [[graft.operators.CdcMerge]]).
  */
final case class ChangeEvent(
    seq: Long,
    tsMs: Long,
    schema: String,
    table: String,
    op: String, // "I" | "U" | "D"
    key: Map[String, String],
    before: Map[String, String],
    after: Map[String, String])

object ChangeEvent {
  val OpInsert = "I"
  val OpUpdate = "U"
  val OpDelete = "D"

  /** Meta column names used by typed change DataFrames. */
  val OpCol = "_op"
  val SeqCol = "_seq"

  val envelopeSchema: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("tsMs", LongType, nullable = false),
    StructField("schema", StringType, nullable = false),
    StructField("table", StringType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("key", MapType(StringType, StringType), nullable = false),
    StructField("before", MapType(StringType, StringType), nullable = true),
    StructField("after", MapType(StringType, StringType), nullable = true)))
}
