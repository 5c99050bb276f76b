package graft.streaming

import graft.model.ChangeEvent
import graft.operators.CdcMerge
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** SCD Type 2 history maintained INCREMENTALLY in the streaming loop —
  * the history-preserving sibling of [[CdcStream]]: where the LWW state
  * keeps each key's latest version, this keeps every version with its
  * validity interval, folded forward one micro-batch at a time.
  *
  * Store layout: one state row per key whose payload is the key's full
  * version history as a sorted array of
  * `(valid_from, valid_to, is_current, ev_op, payload…)` structs —
  * delete events ride along as marked elements (they close intervals
  * and must survive for late-event reconstruction; the user view
  * filters them). Bucketing, versioning, idempotent promotion, GC and
  * OPTIMIZE are all inherited from [[BucketedState]] with the plain key
  * columns, so a key's entire history co-locates in one bucket.
  *
  * Per micro-batch (O(batch keys × avg history), never O(state)):
  *
  *   1. read ONLY the batch keys' history rows (bucket-pruned,
  *      `beforeBatch`-bounded — crash-replay sees identical input);
  *   2. explode them back to events, union the batch's events, drop
  *      exact `(key, _seq)` duplicates (what makes replay idempotent);
  *   3. recompute the touched keys' intervals with the SAME
  *      `lead(_seq)` window the batch operator uses
  *      ([[graft.operators.Scd.scd2]]) — the window runs over
  *      batch-touched rows only;
  *   4. pack back to per-key arrays (sorted by `valid_from`, so array
  *      order is deterministic) and merge at `_seq = batchId`.
  *
  * Out-of-order arrival is handled by construction: a late event with a
  * seq between two existing versions re-links both neighbours' intervals
  * because the key's whole history is recomputed from its events — the
  * result depends only on the SET of events seen, not their batch
  * boundaries (the same order-independence contract as [[CdcStream]],
  * spec-proven against the batch operator).
  */
object StreamScd {
  import ChangeEvent.{OpCol, SeqCol, OpDelete, OpUpdate}

  private val HistCol = "history"
  private val EvOpCol = "ev_op"

  /** Stored schema: key columns + the history array + CDC meta. */
  def histSchema(changeSchema: StructType, keyCols: Seq[String])
      : StructType = {
    val payload = changeSchema.fields
      .filterNot(f => f.name == OpCol || f.name == SeqCol)
      .filterNot(f => keyCols.contains(f.name))
    val element = StructType(
      Seq(StructField("valid_from", LongType),
        StructField("valid_to", LongType),
        StructField("is_current", IntegerType),
        StructField(EvOpCol, StringType))
        ++ payload)
    StructType(
      keyCols.map(k => changeSchema(k))
        ++ Seq(StructField(HistCol, ArrayType(element)),
          StructField(OpCol, StringType),
          StructField(SeqCol, LongType)))
  }

  /** One micro-batch of history maintenance. Public so batch backfills
    * replay the exact streaming semantics. */
  def applyBatch(batch: DataFrame, batchId: Long, histDir: String,
      keyCols: Seq[String], nBuckets: Int): Unit = {
    val spark = batch.sparkSession
    val schema = histSchema(batch.schema, keyCols)
    val payloadCols = batch.columns.toSeq
      .filterNot(c => c == OpCol || c == SeqCol || keyCols.contains(c))
    val keys = batch.select(keyCols.map(col): _*).distinct()
    // one bucket listing for the whole batch: the packed output below
    // holds exactly the batch keys' histories, so its touched buckets
    // ARE the keys' buckets — shared with mergeBatch as the hint, the
    // repack chain then executes exactly once (inside the staged write)
    // instead of once more for mergeBatch's own listing pass
    val touched = BucketedState.touchedBuckets(keys, keyCols, nBuckets)
    val old = BucketedState.stateForKeys(spark, histDir, schema, nBuckets,
      keyCols, keys, beforeBatch = Some(batchId),
      touchedHint = Some(touched))
      .filter(col(OpCol) =!= OpDelete)
    val oldEvents = old
      .select(keyCols.map(col) :+ explode(col(HistCol)).as("_h"): _*)
      .select(keyCols.map(col)
        ++ payloadCols.map(c => col(s"_h.$c").as(c))
        ++ Seq(col(s"_h.$EvOpCol").as(OpCol),
          col("_h.valid_from").as(SeqCol)): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(SeqCol))
    val allEvents = oldEvents
      .unionByName(batch.select(oldEvents.columns.map(col): _*))
      // replay idempotence: a re-delivered batch re-adds events the
      // history already holds; (key, seq) identifies an event and
      // duplicates are byte-identical, so keep the first of each run.
      // The dedup is a lag flag on the SAME key-partitioned,
      // seq-ordered window the interval link uses below — it rides
      // that one exchange+sort (filter preserves both, so the lead
      // window re-uses them) instead of dropDuplicates' own
      // (key, seq) aggregate shuffle, which did NOT satisfy the
      // window's key-clustering and forced a second exchange (r15)
      .withColumn("_dup", lag(col(SeqCol), 1).over(w) === col(SeqCol))
      .filter(!coalesce(col("_dup"), lit(false)))
      .drop("_dup")
    val linked = allEvents
      .withColumn("valid_to", lead(col(SeqCol), 1).over(w))
      .withColumn("is_current",
        (col("valid_to").isNull && col(OpCol) =!= OpDelete).cast("int"))
    val packed = linked
      .groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_list(struct(
        col(SeqCol).as("valid_from") +: col("valid_to")
          +: col("is_current") +: col(OpCol).as(EvOpCol)
          +: payloadCols.map(col): _*))).as(HistCol))
      .withColumn(OpCol, lit(OpUpdate))
      .withColumn(SeqCol, lit(batchId))
    BucketedState.mergeBatch(packed, batchId, histDir, keyCols, nBuckets,
      touchedHint = Some(touched))
  }

  /** Start the maintenance stream over a file change log (same source
    * contract as [[CdcStream.start]]). */
  def start(spark: SparkSession, changesDir: String,
      changeSchema: StructType, histDir: String, checkpointDir: String,
      keyCols: Seq[String], nBuckets: Int = 16,
      maxFilesPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow(),
      maintenance: CdcStream.Maintenance = CdcStream.Maintenance())
      : StreamingQuery = {
    var reader = spark.readStream.schema(changeSchema)
    maxFilesPerTrigger.foreach(n =>
      reader = reader.option("maxFilesPerTrigger", n))
    val guarded = CdcMerge.requireKeys(reader.parquet(changesDir), keyCols,
      new org.apache.hadoop.fs.Path(histDir).getName)
    guarded.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, histDir, keyCols, nBuckets)
        maintenance.run(spark, histDir, batchId,
          histSchema(batch.schema, keyCols), keyCols, Some(nBuckets))
      }
      .trigger(trigger)
      .start()
  }

  /** The user-facing history table: one row per I/U version with its
    * validity interval — the same shape as [[graft.operators.Scd.scd2]]
    * (delete markers dropped; they only close intervals). */
  def currentHistory(spark: SparkSession, histDir: String,
      changeSchema: StructType, keyCols: Seq[String],
      nBuckets: Int = 16): DataFrame = {
    val schema = histSchema(changeSchema, keyCols)
    val payloadCols = changeSchema.fields.map(_.name)
      .filterNot(c => c == OpCol || c == SeqCol || keyCols.contains(c))
      .toSeq
    BucketedState.currentView(spark, histDir, schema, nBuckets)
      .select(keyCols.map(col) :+ explode(col(HistCol)).as("_h"): _*)
      .filter(col(s"_h.$EvOpCol") =!= OpDelete)
      .select(keyCols.map(col)
        ++ payloadCols.map(c => col(s"_h.$c").as(c))
        ++ Seq(col("_h.valid_from").as("valid_from"),
          col("_h.valid_to").as("valid_to"),
          col("_h.is_current").as("is_current")): _*)
  }

  /** Drain everything currently in the change log and return the final
    * maintained history. */
  def replayToCompletion(spark: SparkSession, changesDir: String,
      changeSchema: StructType, histDir: String, checkpointDir: String,
      keyCols: Seq[String], nBuckets: Int = 16,
      maxFilesPerTrigger: Option[Int] = None,
      maintenance: CdcStream.Maintenance = CdcStream.Maintenance())
      : DataFrame = {
    val q = start(spark, changesDir, changeSchema, histDir, checkpointDir,
      keyCols, nBuckets, maxFilesPerTrigger, maintenance = maintenance)
    q.awaitTermination()
    currentHistory(spark, histDir, changeSchema, keyCols, nBuckets)
  }
}
