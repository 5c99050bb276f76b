package graft.streaming

import graft.model.ChangeEvent
import graft.operators.CdcMerge
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Incrementally-maintained aggregate materialized view over a CDC
  * change stream — the downstream half of the reference's deployment
  * story. The reference syncs MySQL into ClickHouse precisely so users
  * can hang `SummingMergeTree` materialized views off the replicated
  * table (reference: README.md:44-56 documents the MergeTree sink
  * engines; clickhouse/client.go:129-230 the mutation feed they absorb).
  * ClickHouse folds those partial sums lazily at merge time; here the
  * same contract is an explicit delta-maintenance loop with exact
  * arithmetic and replay-idempotence.
  *
  * Per micro-batch (all steps O(batch) + O(touched groups), never
  * O(state)):
  *
  *   1. pre-batch images of the BATCH's keys only, via the
  *      bucket-pruned lookup ([[BucketedState.stateForKeys]] with
  *      `beforeBatch`) — tombstones and `_seq` included, so the
  *      old/new comparison replays the merge's exact semantics
  *      (a late update below a tombstone's `_seq` stays dead here
  *      exactly as it does in the store);
  *   2. post-batch images = the same latest-by-`_seq` collapse the
  *      key-state merge applies ([[graft.operators.CdcMerge
  *      .latestByKey]] over old-state ∪ batch);
  *   3. group deltas: old live images retract (weight −1), new live
  *      images add (+1); one aggregate over ±batch rows;
  *   4. fold: read ONLY the touched groups' current aggregates from
  *      the view store (bucket-pruned, `beforeBatch`-bounded), add the
  *      deltas, and emit the new group rows as U events — D when a
  *      group's live count reaches zero — merged via the same
  *      [[BucketedState]] machinery, keyed by the group columns.
  *
  * Exactness: measure columns must be integral (pre-scale currency to
  * cents upstream). Integer addition is associative and commutative, so
  * the incrementally-maintained sum is bit-identical to a direct
  * aggregate of the final state under ANY batch boundary, partitioning,
  * or replay — the property the oracle gate checks. Doubles would drift
  * by accumulation order and are rejected at construction.
  *
  * Crash-safety: both state reads are bounded `beforeBatch = batchId`
  * and both merges are idempotent bucket promotions, so replaying a
  * batch after a crash recomputes identical deltas against identical
  * pre-batch state — exactly-once observable view state from
  * at-least-once delivery, the same argument as [[CdcStream]].
  *
  * Scale: a 10⁹-key table with a 128-row flush reads/writes the
  * key-buckets and group-buckets those 128 rows touch. View storage is
  * O(groups), version accumulation is bounded by the same
  * [[CdcStream.Maintenance]] knob the key state uses (applied to both
  * stores).
  */
object AggView {
  import ChangeEvent.{OpCol, SeqCol, OpDelete, OpUpdate}

  /** View definition over a prepared change stream whose payload is
    * exactly `keyCols ++ groupCols ++ measureCols` (project/derive
    * upstream — e.g. month from a date, cents from a price).
    * Maintained output: `groupCols, cnt, sum_<m>...`. */
  final case class Spec(keyCols: Seq[String], groupCols: Seq[String],
      measureCols: Seq[String]) {
    require(keyCols.nonEmpty && groupCols.nonEmpty)
    require(groupCols.intersect(measureCols).isEmpty,
      "a column cannot be both group and measure")
    def sumCol(m: String): String = s"sum_$m"
    def outputCols: Seq[String] =
      groupCols ++ (CntCol +: measureCols.map(sumCol))
  }

  val CntCol = "cnt"

  private def requireIntegral(schema: StructType, spec: Spec): Unit =
    spec.measureCols.foreach { m =>
      schema(m).dataType match {
        case ByteType | ShortType | IntegerType | LongType => ()
        case dt => throw new IllegalArgumentException(
          s"measure $m: $dt — incremental +/- maintenance is only exact " +
            "over integral types; pre-scale to integer units upstream")
      }
    }

  /** Stored schema of the view's state (group cols typed as in the
    * change stream, counters as long, plus the CDC meta columns). */
  def viewSchema(changeSchema: StructType, spec: Spec): StructType = {
    requireIntegral(changeSchema, spec)
    StructType(
      spec.groupCols.map(g => changeSchema(g))
        ++ Seq(StructField(CntCol, LongType))
        ++ spec.measureCols.map(m => StructField(spec.sumCol(m), LongType))
        ++ Seq(StructField(OpCol, StringType),
          StructField(SeqCol, LongType)))
  }

  /** One micro-batch of delta maintenance: merge the batch into the
    * key-level state AND fold its group deltas into the view state.
    * Public so batch backfills replay the exact streaming semantics.
    *
    * `serve` (optional) receives the batch's emitted group events —
    * the new `(groupCols, cnt, sum_*, _op, _seq)` rows of exactly the
    * touched groups, `_op = D` where a group's live count reached
    * zero — while they are still pinned, so a downstream push (the
    * JDBC delta in [[startToJdbc]]) costs O(touched groups) with no
    * extra state read. */
  /** Returns the EFFECTIVE change schema the batch was folded under
    * (the pin, possibly wider than the batch after an absorbed DROP) —
    * the schema maintenance passes must read/rewrite the key state
    * with, or a compaction would silently shed a retained column. */
  def applyBatch(batch: DataFrame, batchId: Long, keyStateDir: String,
      viewDir: String, spec: Spec, stateBuckets: Int,
      viewBuckets: Int, serve: DataFrame => Unit = _ => ()): StructType = {
    val spark = batch.sparkSession
    // schema-evolution contract (pin lives with the key state — one per
    // view instance): an ADDITIVE nullable payload column is absorbed
    // (the view never folds it; pre-batch state reads it as null), a
    // DROP of such a column is absorbed by null-padding the batch to
    // the pinned width (state keeps the column), any key/group/measure
    // or type change fail-stops — see BucketedState.resolveSchema
    val effSchema = BucketedState.resolveSchema(spark, keyStateDir,
      batch.schema, new org.apache.hadoop.fs.Path(viewDir).getName,
      reservedCols = spec.keyCols ++ spec.groupCols ++ spec.measureCols)
    requireIntegral(effSchema, spec)
    // the batch feeds several consumers (key listing + broadcast,
    // key-state merge, the image fold) — pin it once instead of
    // re-scanning the change-log parquet per consumer
    val b = BucketedState.conform(batch, effSchema).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val keys = b.select(spec.keyCols.map(col): _*).distinct()
    // one key-bucket listing, shared with the key-state merge below as
    // its touchedHint (the merge writes exactly the batch keys' buckets)
    val keyBuckets = BucketedState.touchedBuckets(keys, spec.keyCols,
      stateBuckets)
    // pre-batch state of the batch's keys, tombstones included —
    // version-bounded so a crash-replay recomputes identical deltas,
    // and byte-identical however often the delta evaluates even after
    // the merge below lands new versions
    val oldState: DataFrame = BucketedState.stateForKeys(spark,
      keyStateDir, effSchema, stateBuckets, spec.keyCols, keys,
      beforeBatch = Some(batchId), touchedHint = Some(keyBuckets))
    // per-key old/new images in ONE aggregate (the r14 fusion,
    // [[CdcMerge.oldNewImages]] — replaces the window collapse + two
    // contribution passes); the ±1-weighted contributions then fall
    // out scan-locally: −1 for a live old image, +1 for a live new one
    val both = CdcMerge.oldNewImages(oldState, b, spec.keyCols,
      spec.groupCols ++ spec.measureCols)
    def sideContrib(side: String, sign: Int) =
      when(col(s"$side.$OpCol") =!= OpDelete,
        struct(spec.groupCols.map(g => col(s"$side.$g").as(g))
          ++ Seq(lit(sign.toLong).as("_w"),
            struct(spec.measureCols.map(m =>
              coalesce(col(s"$side.$m").cast(LongType), lit(0L)).as(m)): _*)
              .as("_m")): _*))
    // ±1-weighted group deltas: ONE aggregate over at most
    // 2×|batch keys| contribution rows (a null `_old` struct yields a
    // null condition → no contribution, same for a tombstone image)
    val delta = both
      .select(explode(filter(
        array(sideContrib("_old", -1), sideContrib("_new", 1)),
        e => e.isNotNull)).as("_c"))
      .select(col("_c.*"))
      .groupBy(spec.groupCols.map(col): _*)
      .agg(sum(col("_w")).as("_d_cnt"),
        spec.measureCols.map(m =>
          sum(col("_w") * col(s"_m.$m")).as(s"_d_$m")): _*)
      // groups the batch left untouched value-wise are no-ops: don't
      // rewrite their buckets, don't bump their version
      .filter(spec.measureCols.map(m => col(s"_d_$m") =!= 0L)
        .foldLeft(col("_d_cnt") =!= 0L)(_ || _))
      // three consumers (touched-group listing, the fold join, and the
      // view merge's own input evaluation) — and each delta evaluation
      // re-reads the old-state buckets and re-runs the image fold,
      // so the pin pays for itself immediately
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // key-state merge CONCURRENT with the view fold below: nothing
    // after this point reads the key store, and the delta's own
    // old-state evaluations are beforeBatch-bounded, so the new
    // v=batchId versions are invisible to them however the two
    // interleave (the BucketedState.commitPool argument)
    val keyCommit = scala.concurrent.Future {
      BucketedState.mergeBatch(b, batchId, keyStateDir, spec.keyCols,
        stateBuckets, touchedHint = Some(keyBuckets))
    }(BucketedState.commitPool)
    try {
    val aggSchema = viewSchema(effSchema, spec)
    val touched = delta.select(spec.groupCols.map(col): _*)
    // one group-bucket listing, shared with the view merge below: the
    // fold emits exactly one event per delta group, so the events'
    // buckets ARE the touched groups' buckets
    val groupBuckets = BucketedState.touchedBuckets(touched,
      spec.groupCols, viewBuckets)
    // current aggregates of ONLY the touched groups; null-safe join
    // because a group column may legitimately hold null
    val aggOld = BucketedState.stateForKeys(spark, viewDir, aggSchema,
      viewBuckets, spec.groupCols, touched,
      beforeBatch = Some(batchId), touchedHint = Some(groupBuckets))
      .filter(col(OpCol) =!= OpDelete)
    val joined = delta.alias("d").join(aggOld.alias("o"),
      spec.groupCols.map(g => col(s"d.$g") <=> col(s"o.$g"))
        .reduce(_ && _),
      "left")
    val newCnt = coalesce(col(s"o.$CntCol"), lit(0L)) + col("_d_cnt")
    val events = joined.select(
      spec.groupCols.map(g => col(s"d.$g").as(g))
        ++ Seq(newCnt.as(CntCol))
        ++ spec.measureCols.map(m =>
          (coalesce(col(s"o.${spec.sumCol(m)}"), lit(0L))
            + col(s"_d_$m")).as(spec.sumCol(m)))
        ++ Seq(
          when(newCnt === 0L, lit(ChangeEvent.OpDelete))
            .otherwise(lit(OpUpdate)).as(OpCol),
          lit(batchId).as(SeqCol)): _*)
      // consumers: the view merge's touched listing + write, and
      // `serve` — pinned so the fold join runs once
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // view merge CONCURRENT with serve: serve consumes the already-
      // computed events frame (the JDBC bootstrap folds the pre-batch
      // view in memory), so neither reads the store mid-promotion
      val viewCommit = scala.concurrent.Future {
        BucketedState.mergeBatch(events, batchId, viewDir,
          spec.groupCols, viewBuckets, touchedHint = Some(groupBuckets))
      }(BucketedState.commitPool)
      try {
        serve(events)
        // both commits land before the pins release (and before the
        // caller's checkpoint commit); failures propagate
        scala.concurrent.Await.result(viewCommit,
          scala.concurrent.duration.Duration.Inf)
      } catch {
        case t: Throwable =>
          // join the in-flight commit on a failing batch so a retry of
          // the same batchId never races an orphaned merge against its
          // own staging directory
          BucketedState.joinQuietly(viewCommit)
          throw t
      }
    } finally events.unpersist(false)
    scala.concurrent.Await.result(keyCommit,
      scala.concurrent.duration.Duration.Inf)
    effSchema
    } catch {
      case t: Throwable =>
        BucketedState.joinQuietly(keyCommit)
        throw t
    } finally delta.unpersist(false)
    } finally b.unpersist(false)
  }

  /** Start the maintenance stream over a file change log (same source
    * contract as [[CdcStream.start]]). */
  def start(spark: SparkSession, changesDir: String,
      changeSchema: StructType, keyStateDir: String, viewDir: String,
      checkpointDir: String, spec: Spec, stateBuckets: Int = 16,
      viewBuckets: Int = 8, maxFilesPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow(),
      maintenance: CdcStream.Maintenance = CdcStream.Maintenance())
      : StreamingQuery = {
    var reader = spark.readStream.schema(changeSchema)
    maxFilesPerTrigger.foreach(n =>
      reader = reader.option("maxFilesPerTrigger", n))
    val guarded = CdcMerge.requireKeys(reader.parquet(changesDir),
      spec.keyCols, new org.apache.hadoop.fs.Path(viewDir).getName)
    guarded.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // maintenance reads/rewrites the key state under the EFFECTIVE
        // schema applyBatch folded with — after an absorbed DROP the
        // pin is wider than the batch, and compacting under the narrow
        // batch schema would shed the retained column's values
        val eff = applyBatch(batch, batchId, keyStateDir, viewDir, spec,
          stateBuckets, viewBuckets)
        maintenance.run(spark, keyStateDir, batchId, eff,
          spec.keyCols, Some(stateBuckets))
        maintenance.run(spark, viewDir, batchId,
          viewSchema(eff, spec), spec.groupCols,
          Some(viewBuckets))
      }
      .trigger(trigger)
      .start()
  }

  /** [[start]], plus a real-database serving endpoint for the VIEW —
    * the reference's continuous-replication posture applied to the
    * aggregate table a dashboard actually reads: after each
    * micro-batch's fold, the JDBC table is brought to agreement on the
    * batch's TOUCHED GROUPS only (delete-then-insert per group via
    * [[graft.sources.JdbcSink.upsertKeys]]; a group whose live count
    * hit zero is deleted) — database work per trigger is O(touched
    * groups), never O(groups), and the push input is the already-pinned
    * event frame, so no state is re-read. The first batch against a
    * missing table bootstraps with a full
    * [[graft.sources.JdbcSink.replace]] of the current view. A crash
    * before checkpoint commit replays the batch into the same
    * idempotent push — exactly-once observable serving state. */
  def startToJdbc(spark: SparkSession, changesDir: String,
      changeSchema: StructType, keyStateDir: String, viewDir: String,
      checkpointDir: String, spec: Spec, jdbcUrl: String,
      jdbcTable: String, stateBuckets: Int = 16, viewBuckets: Int = 8,
      maxFilesPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow(),
      jdbcOptions: Map[String, String] = Map.empty,
      maintenance: CdcStream.Maintenance = CdcStream.Maintenance())
      : StreamingQuery = {
    import graft.sources.JdbcSink
    var reader = spark.readStream.schema(changeSchema)
    maxFilesPerTrigger.foreach(n =>
      reader = reader.option("maxFilesPerTrigger", n))
    val guarded = CdcMerge.requireKeys(reader.parquet(changesDir),
      spec.keyCols, jdbcTable)
    guarded.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val eff = applyBatch(batch, batchId, keyStateDir, viewDir, spec,
          stateBuckets, viewBuckets, serve = events => {
            if (!JdbcSink.tableExists(jdbcUrl, jdbcTable, jdbcOptions)) {
              // bootstrap must not read the view store — its commit is
              // in flight concurrently with serve. Fold the post-batch
              // view in memory: pre-batch state (version-bounded) ∪
              // this batch's events, the same LWW collapse the merge
              // applies.
              val post = CdcMerge.latestByKey(
                BucketedState.currentState(spark, viewDir,
                  viewSchema(batch.schema, spec), viewBuckets,
                  beforeBatch = Some(batchId))
                  .unionByName(events),
                spec.groupCols)
                .filter(col(OpCol) =!= OpDelete)
                .drop(OpCol, SeqCol)
              JdbcSink.replace(post, jdbcUrl, jdbcTable,
                options = jdbcOptions)
            } else {
              val keys = events.select(spec.groupCols.map(col): _*)
              val live = events.filter(col(OpCol) =!= OpDelete)
                .select(spec.outputCols.map(col): _*)
              JdbcSink.upsertKeys(keys, live, spec.groupCols, jdbcUrl,
                jdbcTable, options = jdbcOptions)
            }
          })
        maintenance.run(spark, keyStateDir, batchId, eff,
          spec.keyCols, Some(stateBuckets))
        maintenance.run(spark, viewDir, batchId,
          viewSchema(eff, spec), spec.groupCols,
          Some(viewBuckets))
      }
      .trigger(trigger)
      .start()
  }

  /** The maintained aggregate table: `groupCols, cnt, sum_<m>...`. */
  def currentView(spark: SparkSession, viewDir: String,
      changeSchema: StructType, spec: Spec,
      viewBuckets: Int = 8): DataFrame =
    BucketedState.currentView(spark, viewDir,
      viewSchema(changeSchema, spec), viewBuckets)

  /** Drain everything currently in the change log and return the final
    * maintained view. */
  def replayToCompletion(spark: SparkSession, changesDir: String,
      changeSchema: StructType, keyStateDir: String, viewDir: String,
      checkpointDir: String, spec: Spec, stateBuckets: Int = 16,
      viewBuckets: Int = 8, maxFilesPerTrigger: Option[Int] = None,
      maintenance: CdcStream.Maintenance = CdcStream.Maintenance())
      : DataFrame = {
    val q = start(spark, changesDir, changeSchema, keyStateDir, viewDir,
      checkpointDir, spec, stateBuckets, viewBuckets, maxFilesPerTrigger,
      maintenance = maintenance)
    q.awaitTermination()
    currentView(spark, viewDir, changeSchema, spec, viewBuckets)
  }
}
