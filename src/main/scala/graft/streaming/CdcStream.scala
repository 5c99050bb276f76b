package graft.streaming

import graft.model.ChangeEvent
import graft.operators.CdcMerge
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming CDC apply: a file-based change-log source micro-batched into
  * a versioned parquet target via `foreachBatch` MERGE.
  *
  * Reference shape: binlog tail → buffered flush by size/time → bulk apply
  * → checkpoint binlog position (reference: river/sync.go:116-178,
  * river/master.go:53-83). Here each piece maps to first-class Structured
  * Streaming machinery:
  *
  *   - binlog tail        → `readStream` file source over the change log
  *                          (`maxFilesPerTrigger` = the bulk_size analog)
  *   - flush ticker       → `Trigger.ProcessingTime` / `AvailableNow`
  *   - position file      → `checkpointLocation` offset+commit log; resume
  *                          is restart-with-same-checkpoint (ST7)
  *   - ReplacingMergeTree → explicit latest-by-`_seq` state with delete
  *                          tombstones — the ClickHouse
  *                          `ReplacingMergeTree(ver, is_deleted)` engine the
  *                          reference documents (README.md:56,161), made
  *                          deterministic
  *
  * Ordering: the reference relies on single-threaded arrival order (ST2).
  * A distributed engine cannot, so state keeps `(_op, _seq)` per key and
  * every merge takes the max-`_seq` event — the result is identical for
  * ANY partitioning or batch boundary of the same event set, including
  * out-of-order file pickup and batch replay after a crash (ST3:
  * exactly-once observable state from at-least-once delivery, because the
  * per-batch output write is an idempotent overwrite of `v=<batchId>`).
  *
  * Scale: state grows by key count, not event count (one row per key).
  * Tombstones persist so a late event can never resurrect a deleted key;
  * production GC drops tombstones older than the source's max replay
  * horizon (the analog of ClickHouse's `OPTIMIZE ... FINAL` collapse).
  */
object CdcStream {
  import ChangeEvent.{OpCol, SeqCol, OpDelete}

  /** Knob-driven state maintenance for the streaming loops — the analog
    * of the reference overwriting `master.info` in place instead of
    * accumulating history (river/master.go:53-83): without it every
    * micro-batch leaves a full prior version behind and storage grows
    * linearly in batch count, the one cost that scales with UPTIME
    * rather than data.
    *
    *   - `gcEvery`: every K batches drop state versions beyond the
    *     newest `keepVersions` (listing-only — cheap enough to run
    *     every batch). `keepVersions >= 2` always preserves the
    *     pre-batch version an in-flight crash-replay would read.
    *   - `optimizeEvery` (bucketed layout only): every K batches run
    *     the full [[BucketedState.optimize]] pass — compact each
    *     bucket's latest version to one file, expire tombstones at or
    *     below `tombstoneHorizon`, GC old versions. O(state), so K
    *     amortizes it; the flat layout needs no compaction (each
    *     version is already `coalesce(stateFiles)` files).
    *
    * Both default 0 = off, mirroring [[graft.operators.IncrementalDedup
    * .stream]]'s `compactEvery`. */
  final case class Maintenance(
      gcEvery: Int = 0,
      keepVersions: Int = 2,
      optimizeEvery: Int = 0,
      tombstoneHorizon: Option[Long] = None) {
    // >= 2, not >= 1: maintenance runs INSIDE the live loop, where the
    // pre-batch version must survive for a crash-replay to re-read —
    // keep=1 would let "merge v=N, GC, crash before checkpoint commit"
    // replay batch N against an EMPTY state and silently truncate the
    // table. (The standalone gcVersions/optimize still accept keep=1
    // for a stopped stream.)
    require(keepVersions >= 2,
      "Maintenance.keepVersions must be >= 2: a crash-replay reads the " +
        "pre-batch version; keep=1 can truncate state on replay")
    private def due(every: Int, batchId: Long): Boolean =
      every > 0 && batchId > 0 && batchId % every == 0

    /** Run whatever is due after `batchId`'s merge. OPTIMIZE subsumes
      * version GC (it ends with a `gcVersions`), so a batch where both
      * fire pays only the optimize. `bucketCols` must mirror the
      * store's split bucketing when it has one ([[MinMaxView]]'s
      * group-bucketed projection) — an optimize that re-buckets by row
      * identity would scatter a co-located layout. */
    def run(spark: SparkSession, targetDir: String, batchId: Long,
        stateSchema: StructType, keyCols: Seq[String],
        stateBuckets: Option[Int],
        bucketCols: Seq[String] = Nil): Unit = stateBuckets match {
      case Some(n) if due(optimizeEvery, batchId) =>
        BucketedState.optimize(spark, targetDir, stateSchema, n, keyCols,
          tombstoneHorizon, keepVersions, bucketCols = bucketCols)
      case Some(n) if due(gcEvery, batchId) =>
        BucketedState.gcVersions(spark, targetDir, n, keepVersions); ()
      case None if due(gcEvery, batchId) =>
        gcVersions(spark, targetDir, keepVersions); ()
      case _ => ()
    }
  }

  /** Versioned state layout: `targetDir/v=<batchId>/` parquet per batch,
    * highest complete version = current state. Parquet `_SUCCESS` markers
    * gate completeness, so a batch killed mid-write is invisible. */
  private def versions(spark: SparkSession, targetDir: String): Seq[Long] = {
    val path = new Path(targetDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .filter(s => fs.exists(new Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
      .sorted
  }

  /** Current merged state (payload + `_op` + `_seq`), empty if no batch
    * has committed. `beforeBatch` bounds the version for replay: batch N
    * re-merges on top of the state BEFORE N, so re-running N after a
    * crash is idempotent. */
  def currentState(spark: SparkSession, targetDir: String,
      stateSchema: StructType,
      beforeBatch: Option[Long] = None): DataFrame = {
    val vs = versions(spark, targetDir)
    val eligible = beforeBatch.map(b => vs.filter(_ < b)).getOrElse(vs)
    eligible.lastOption match {
      case Some(v) => spark.read.schema(stateSchema)
        .parquet(s"$targetDir/v=$v")
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stateSchema)
    }
  }

  /** The user-facing table: live keys only, meta columns dropped. */
  def currentView(spark: SparkSession, targetDir: String,
      stateSchema: StructType): DataFrame =
    currentState(spark, targetDir, stateSchema)
      .filter(col(OpCol) =!= OpDelete)
      .drop(OpCol, SeqCol)

  /** Merge one micro-batch into the versioned state. Public so batch
    * backfills can reuse the exact streaming semantics.
    *
    * `tombstoneHorizon`: delete markers whose `_seq` ≤ horizon are
    * dropped during the merge — safe once the source guarantees no event
    * at or below that sequence can still arrive (the reference's analog:
    * ReplacingMergeTree rows collapse for good at OPTIMIZE FINAL). */
  def mergeBatch(batch: DataFrame, batchId: Long, targetDir: String,
      keyCols: Seq[String], ignoreUpdates: Boolean,
      ignoreDeletes: Boolean, tombstoneHorizon: Option[Long] = None,
      stateFiles: Int = 8): Unit = {
    val spark = batch.sparkSession
    val state = currentState(spark, targetDir, batch.schema,
      beforeBatch = Some(batchId))
    val effective = CdcMerge.filterOps(batch, ignoreUpdates, ignoreDeletes)
    val merged = CdcMerge.latestByKey(state.unionByName(effective), keyCols)
    val gced = tombstoneHorizon match {
      case Some(h) =>
        merged.filter(!(col(OpCol) === OpDelete && col(SeqCol) <= h))
      case None => merged
    }
    // AQE is off inside foreachBatch, so without this every version is
    // written as shuffle.partitions tiny files that the next batch must
    // re-list and re-open. The flat path rewrites full state per batch
    // by design (the bucketed path is the at-scale layout); `stateFiles`
    // bounds its version fan-out.
    gced.coalesce(stateFiles)
      .write.mode("overwrite").parquet(s"$targetDir/v=$batchId")
  }

  /** Drop state versions older than the newest `keep` per target — every
    * batch writes a full copy, so without GC storage grows linearly in
    * batch count. `keep >= 2` always leaves the pre-batch state an
    * in-flight replay would read. */
  def gcVersions(spark: SparkSession, targetDir: String,
      keep: Int = 2): Int = {
    require(keep >= 1)
    val path = new Path(targetDir)
    val f = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vs = versions(spark, targetDir)
    val doomed = vs.dropRight(keep)
    doomed.foreach(v => f.delete(new Path(s"$targetDir/v=$v"), true))
    doomed.size
  }

  /** Start the streaming apply. The change log is a directory of parquet
    * files with the target's payload columns + `_op` + `_seq`; new files
    * are picked up per trigger (`maxFilesPerTrigger` caps batch size —
    * the reference's `bulk_size`). Restarting with the same
    * `checkpointDir` resumes from the recorded offset (ST7). */
  def start(spark: SparkSession, changesDir: String,
      changeSchema: StructType, targetDir: String, checkpointDir: String,
      keyCols: Seq[String], ignoreUpdates: Boolean = false,
      ignoreDeletes: Boolean = false,
      maxFilesPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow(),
      stateBuckets: Option[Int] = None,
      route: String = "",
      maintenance: Maintenance = Maintenance()): StreamingQuery = {
    var reader = spark.readStream.schema(changeSchema)
    maxFilesPerTrigger.foreach(n =>
      reader = reader.option("maxFilesPerTrigger", n))
    // the PK guard's abort message names the route so a fail-stop is
    // attributable; default to the target's directory name
    val routeName = if (route.nonEmpty) route else new Path(targetDir).getName
    val guarded = Observability.withOpMetrics(
      CdcMerge.requireKeys(reader.parquet(changesDir), keyCols, routeName))
    guarded
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        stateBuckets match {
          case Some(n) => BucketedState.mergeBatch(batch, batchId,
            targetDir, keyCols, n, ignoreUpdates, ignoreDeletes)
          case None => mergeBatch(batch, batchId, targetDir, keyCols,
            ignoreUpdates, ignoreDeletes)
        }
        maintenance.run(spark, targetDir, batchId, batch.schema, keyCols,
          stateBuckets)
      }
      .trigger(trigger)
      .start()
  }

  /** [[start]], plus a real-database serving endpoint: after each
    * micro-batch merges into the versioned parquet state, the JDBC
    * table is brought to agreement with the new state on the BATCH's
    * keys only ([[graft.sources.JdbcSink.upsertKeys]]) — the
    * reference's continuous MySQL→ClickHouse replication loop with
    * both endpoints live, and its delta posture: per-key mutations
    * (clickhouse/client.go:249-335), so database work per trigger is
    * O(batch), never O(state). A 10⁹-row synced table taking a
    * 128-row flush writes 128 keys, not 10⁹.
    *
    * The first batch against a missing table bootstraps with a full
    * [[graft.sources.JdbcSink.replace]] (which also creates the
    * table); `fullReplace = true` forces that repair path on every
    * batch for a sink that drifted out from under the stream.
    *
    * The parquet state stays the source of truth (resume, replay,
    * GC). The push happens INSIDE foreachBatch, so a batch whose push
    * fails replays — at-least-once into an idempotent push
    * (delete-batch-keys-then-insert, see [[graft.sources.JdbcSink
    * .upsertKeys]]) = the same observable exactly-once the parquet
    * path has.
    *
    * `stateBuckets`: with the partition-scoped [[BucketedState]] store
    * (the 100 TB state layout), the whole loop is O(batch): the merge
    * rewrites only the batch's key-buckets and the delta lookup reads
    * only those buckets back ([[BucketedState.viewForKeys]]) — no step
    * ever scans the full state after bootstrap. */
  def startToJdbc(spark: SparkSession, changesDir: String,
      changeSchema: StructType, targetDir: String, checkpointDir: String,
      keyCols: Seq[String], jdbcUrl: String, jdbcTable: String,
      ignoreUpdates: Boolean = false, ignoreDeletes: Boolean = false,
      maxFilesPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow(),
      jdbcOptions: Map[String, String] = Map.empty,
      fullReplace: Boolean = false,
      stateBuckets: Option[Int] = None,
      maintenance: Maintenance = Maintenance()): StreamingQuery = {
    var reader = spark.readStream.schema(changeSchema)
    maxFilesPerTrigger.foreach(n =>
      reader = reader.option("maxFilesPerTrigger", n))
    val routeName = new Path(targetDir).getName
    val guarded = Observability.withOpMetrics(
      CdcMerge.requireKeys(reader.parquet(changesDir), keyCols, routeName))
    guarded
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        stateBuckets match {
          case Some(nb) => BucketedState.mergeBatch(batch, batchId,
            targetDir, keyCols, nb, ignoreUpdates, ignoreDeletes)
          case None => mergeBatch(batch, batchId, targetDir, keyCols,
            ignoreUpdates, ignoreDeletes)
        }
        def fullView = stateBuckets match {
          case Some(nb) =>
            BucketedState.currentView(spark, targetDir, changeSchema, nb)
          case None => currentView(spark, targetDir, changeSchema)
        }
        if (fullReplace ||
            !graft.sources.JdbcSink.tableExists(jdbcUrl, jdbcTable,
              jdbcOptions)) {
          graft.sources.JdbcSink.replace(fullView, jdbcUrl, jdbcTable,
            options = jdbcOptions)
        } else {
          // the batch's distinct keys (small — bounded by trigger
          // size); their post-merge live rows via one broadcast
          // semi-join — against only the touched buckets when the
          // state is bucketed, the (single-scan) flat state otherwise
          val keys = batch.select(keyCols.map(col): _*).distinct()
          val current = stateBuckets match {
            case Some(nb) => BucketedState.viewForKeys(spark, targetDir,
              changeSchema, nb, keyCols, keys)
            case None => currentView(spark, targetDir, changeSchema)
              .join(broadcast(keys), keyCols, "left_semi")
          }
          graft.sources.JdbcSink.upsertKeys(keys, current, keyCols,
            jdbcUrl, jdbcTable, options = jdbcOptions)
        }
        // maintenance runs AFTER the push: a crash before this point
        // replays the batch (checkpoint uncommitted), and keepVersions
        // >= 2 preserves the pre-batch state that replay reads
        maintenance.run(spark, targetDir, batchId, batch.schema, keyCols,
          stateBuckets)
      }
      .trigger(trigger)
      .start()
  }

  /** Bootstrap hand-off (SURVEY §3.2): load a snapshot as the state's
    * version 0 — every row an insert at `snapshotSeq` — then start the
    * change stream on top. The reference replays a mysqldump as insert
    * events and tails the binlog from the dump's recorded position
    * (river/river.go:111-145); here the snapshot is one batch write and
    * the stream's checkpoint begins empty, so only post-snapshot change
    * files are merged. `snapshotSeq` must sit below every change event's
    * `_seq` so late replays of pre-snapshot events lose to snapshot rows
    * they already contain. */
  def bootstrap(snapshot: DataFrame, targetDir: String,
      snapshotSeq: Long = 0L): Unit = {
    // version -1: streaming batch ids start at 0 and must not collide
    // with (or fail to see) the snapshot state
    snapshot
      .withColumn(OpCol, lit(ChangeEvent.OpInsert))
      .withColumn(SeqCol, lit(snapshotSeq))
      .write.mode("overwrite").parquet(s"$targetDir/v=-1")
  }

  /** Run the stream to completion over everything currently in the change
    * log and return the final user-facing table. */
  def replayToCompletion(spark: SparkSession, changesDir: String,
      changeSchema: StructType, targetDir: String, checkpointDir: String,
      keyCols: Seq[String], maxFilesPerTrigger: Option[Int] = None,
      maintenance: Maintenance = Maintenance()): DataFrame = {
    val q = start(spark, changesDir, changeSchema, targetDir, checkpointDir,
      keyCols, maxFilesPerTrigger = maxFilesPerTrigger,
      maintenance = maintenance)
    q.awaitTermination()
    currentView(spark, targetDir, changeSchema)
  }
}
