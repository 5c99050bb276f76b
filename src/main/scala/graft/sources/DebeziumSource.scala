package graft.sources

import graft.model.ChangeEvent
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Adapter from Debezium-format MySQL change events (the de-facto open
  * CDC wire format) to the engine's [[graft.model.ChangeEvent]] envelope.
  *
  * This closes the migration path the reference covers with its embedded
  * binlog reader (`canal.RunFrom(pos)`, reference: river/river.go:102-151):
  * no live MySQL exists in this environment, so instead of an untestable
  * socket client the engine consumes the standard JSON that a Debezium
  * MySQL connector (or any compatible producer) emits to Kafka/files —
  * `spark.readStream` over that feed + [[fromJson]] + the envelope
  * pipeline is the full reference topology.
  *
  * Field mapping (Debezium MySQL envelope, public format):
  *   - `payload.op`: c (create) / r (snapshot read) → I, u → U, d → D —
  *     r→I is exactly the reference's dump-bootstrap-as-inserts
  *     (river/river.go:324-335)
  *   - `payload.source.db` / `source.table` → envelope schema/table
  *   - `payload.before` / `payload.after` → string-encoded maps (the
  *     envelope is schemaless by design; the registry casts later)
  *   - `key` = after (before for deletes) — the typed projection
  *     extracts PK columns from it ([[graft.operators.Envelope.toTyped]])
  *   - `seq` = binlog position packed as (file ordinal << 40) | pos —
  *     the monotonic order of (mysql-bin.NNNNNN, pos), i.e. the same
  *     total order the reference's single-threaded reader consumed and
  *     its master.info checkpointed (river/master.go:53-83). A Kafka
  *     deployment can instead pass its partition offset via `seqCol`.
  *
  * Rows that do not parse as change events (heartbeats, schema-change
  * topics, tombstones) have no op and are dropped.
  */
object DebeziumSource {

  /** The Debezium payload fields the envelope needs. `before`/`after`
    * parse as map<string,string>: Spark stringifies scalar JSON values
    * and keeps nested objects as their JSON text — exactly the
    * envelope's string encoding. */
  val payloadSchema: StructType = StructType(Seq(
    StructField("before", MapType(StringType, StringType)),
    StructField("after", MapType(StringType, StringType)),
    StructField("source", StructType(Seq(
      StructField("db", StringType),
      StructField("table", StringType),
      StructField("file", StringType),
      StructField("pos", LongType),
      StructField("ts_ms", LongType)))),
    StructField("op", StringType),
    StructField("ts_ms", LongType)))

  private val wrapperSchema: StructType =
    StructType(Seq(StructField("payload", payloadSchema)))

  /** Monotonic sequence from a binlog (file, pos) pair: numeric suffix
    * of `mysql-bin.NNNNNN` shifted above the intra-file position (a
    * binlog file position fits 32 bits; 40 leaves margin). */
  private def binlogSeq(file: Column, pos: Column): Column =
    shiftleft(coalesce(
      regexp_extract(file, "([0-9]+)$", 1).cast("long"), lit(0L)), 40) +
      coalesce(pos, lit(0L))

  /** Parse a DataFrame of Debezium JSON strings into the engine
    * envelope. Accepts both the schema-wrapped shape
    * (`{"schema": ..., "payload": {...}}`) and the bare payload
    * (`{"op": "c", ...}`, converter `schemas.enable=false`). */
  def fromJson(lines: DataFrame, jsonCol: String = "value"): DataFrame = {
    val wrapped = from_json(col(jsonCol), wrapperSchema).getField("payload")
    val bare = from_json(col(jsonCol), payloadSchema)
    val p = when(wrapped.getField("op").isNotNull, wrapped).otherwise(bare)
    val op = p.getField("op")
    val before = p.getField("before")
    val after = p.getField("after")
    val src = p.getField("source")
    lines
      .select(
        binlogSeq(src.getField("file"), src.getField("pos")).as("seq"),
        coalesce(p.getField("ts_ms"), src.getField("ts_ms"), lit(0L))
          .as("tsMs"),
        src.getField("db").as("schema"),
        src.getField("table").as("table"),
        // c = insert, r = snapshot read (bootstrap insert), u/d as-is
        when(op.isin("c", "r"), lit(ChangeEvent.OpInsert))
          .when(op === "u", lit(ChangeEvent.OpUpdate))
          .when(op === "d", lit(ChangeEvent.OpDelete))
          .as("op"),
        when(op === "d", before).otherwise(after).as("key"),
        before.as("before"),
        after.as("after"))
      .filter(col("op").isNotNull && col("schema").isNotNull &&
        col("table").isNotNull)
  }
}
