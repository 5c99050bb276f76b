package graft.streaming

import graft.model.ChangeEvent
import graft.operators.CdcMerge
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Incrementally-maintained per-group MIN/MAX (and exact
  * DISTINCT-count, via [[Spec.distinctCols]]) view over a CDC change
  * stream — the companion to [[AggView]] for the aggregates that ±sum
  * folding CANNOT maintain: deleting the current minimum needs the
  * group's next-smallest value, which no per-group scalar can answer
  * (AggView documents the gap; this is the code for it). The pattern
  * it serves is the `AggregatingMergeTree`-style min/max dashboard a
  * user hangs off the reference's replicated table (reference:
  * README.md:44-56 for the MergeTree sink family the sync feeds).
  *
  * Design — a group-keyed secondary PROJECTION plus touched-group
  * recompute, all bucket-pruned:
  *
  *   1. the projection store holds every LIVE row's
  *      `(groupCols, keyCols, valueCols)` image, row identity
  *      `groupCols ++ keyCols` but hash-bucketed by `groupCols` alone
  *      ([[BucketedState]]'s split bucketCols, same mechanism as
  *      [[DedupIndex]]'s band stores) — a group's rows co-locate, so
  *      "all live rows of group g" is a bucket-pruned read no matter
  *      how big the table;
  *   2. per micro-batch, the batch keys' old/new live images (the
  *      same pre-batch lookup + LWW collapse as [[AggView]]) become
  *      projection events: U for every new live image, D for old
  *      (group, key) identities the batch retired — a group-changing
  *      update splits into D@old-group + U@new-group exactly like the
  *      reference's PK-change split (river/sync.go:402-410 is the
  *      analogous key-image discipline);
  *   3. min/max of the TOUCHED groups only are recomputed from the
  *      projection (bucket-pruned group read → one aggregate) and
  *      merged into the view store keyed by `groupCols` — D when a
  *      group lost its last live row.
  *
  * Exactness needs no integral restriction: min/max are comparisons,
  * not accumulations, so any orderable column type replays bit-equal
  * in any engine — the oracle gate checks the view against a direct
  * min/max over the LWW final state.
  *
  * Scale: per batch the work is O(batch) images + O(rows of touched
  * groups) recompute, never O(state) — the recompute is the honest
  * cost of exact min/max under deletes, and it reads only the touched
  * groups' buckets. Crash-replay recomputes identical projection
  * events from identical `beforeBatch`-bounded pre-state, and every
  * merge is an idempotent bucket promotion — exactly-once observable,
  * the same argument as [[CdcStream]]/[[AggView]].
  */
object MinMaxView {
  import ChangeEvent.{OpCol, SeqCol, OpDelete, OpUpdate}

  /** View over a prepared change stream whose payload carries
    * `keyCols ++ groupCols ++ valueCols ++ distinctCols` (project/derive
    * upstream). Maintained output: `groupCols, n_live, min_<v>,
    * max_<v>..., uniq_<d>...`.
    *
    * `distinctCols` generalizes the same projection machinery to the
    * other delete-hostile aggregate ClickHouse users hang off
    * replicated tables (`uniqExact` views, reference README.md:44-56):
    * an HLL sketch cannot retract a deleted value, but the live-row
    * projection holds exactly the state an exact `count(distinct v)`
    * recompute over the touched groups needs — same buckets, same
    * events, one more aggregate expression. Exactness: counting
    * distinct values is comparison-based like min/max, so any
    * orderable type replays bit-equal in any engine. */
  final case class Spec(keyCols: Seq[String], groupCols: Seq[String],
      valueCols: Seq[String], distinctCols: Seq[String] = Nil) {
    require(keyCols.nonEmpty && groupCols.nonEmpty
      && (valueCols.nonEmpty || distinctCols.nonEmpty))
    require(groupCols.intersect(valueCols ++ distinctCols).isEmpty,
      "a column cannot be both group and value/distinct")
    def minCol(v: String): String = s"min_$v"
    def maxCol(v: String): String = s"max_$v"
    def uniqCol(v: String): String = s"uniq_$v"
    def projCols: Seq[String] =
      (groupCols ++ keyCols ++ valueCols ++ distinctCols).distinct
    def outputCols: Seq[String] = groupCols ++ (CntCol +:
      (valueCols.flatMap(v => Seq(minCol(v), maxCol(v)))
        ++ distinctCols.map(uniqCol)))
  }

  val CntCol = "n_live"

  /** Stored schema of the projection (live-row images + CDC meta). */
  def projSchema(changeSchema: StructType, spec: Spec): StructType =
    StructType(spec.projCols.map(c => changeSchema(c))
      ++ Seq(StructField(OpCol, StringType), StructField(SeqCol, LongType)))

  /** Stored schema of the view (group cols + counters + CDC meta). */
  def viewSchema(changeSchema: StructType, spec: Spec): StructType =
    StructType(spec.groupCols.map(g => changeSchema(g))
      ++ Seq(StructField(CntCol, LongType))
      ++ spec.valueCols.flatMap(v => Seq(
        StructField(spec.minCol(v), changeSchema(v).dataType),
        StructField(spec.maxCol(v), changeSchema(v).dataType)))
      ++ spec.distinctCols.map(v =>
        StructField(spec.uniqCol(v), LongType))
      ++ Seq(StructField(OpCol, StringType),
        StructField(SeqCol, LongType)))

  /** The view's aggregate list over live projection rows — shared by
    * the per-batch touched-group recompute and [[minMaxForGroups]].
    * Distinct counts use `size(collect_set(v))`, not `count_distinct`:
    * same exact null-excluding semantics, but one partial/final
    * aggregate pair like min/max instead of count_distinct's
    * Expand + second exchange — two fewer stages per recompute. The
    * per-group set is bounded by the touched groups' live rows, which
    * this recompute already reads in full (the uniqExact state bound). */
  private def aggExprs(spec: Spec) =
    spec.valueCols.flatMap(v => Seq(
      min(col(v)).as(spec.minCol(v)),
      max(col(v)).as(spec.maxCol(v)))) ++
      spec.distinctCols.map(v =>
        size(collect_set(col(v))).cast(LongType).as(spec.uniqCol(v)))

  /** [[aggExprs]] over a frame that still CARRIES its tombstones
    * (latest rows per identity, D included): live rows are selected
    * per-expression via `when`, so the recompute and the
    * emptied-group detection ride ONE aggregate — a group whose latest
    * rows are all D aggregates to `_rc = 0` with all-null min/max, and
    * becomes the view tombstone without the separate anti-join probe
    * the pre-r14 shape paid per batch. */
  private val RawCnt = "_rc"
  private def fusedAggExprs(spec: Spec) = {
    val live = col(OpCol) =!= OpDelete
    spec.valueCols.flatMap(v => Seq(
      min(when(live, col(v))).as(spec.minCol(v)),
      max(when(live, col(v))).as(spec.maxCol(v)))) ++
      spec.distinctCols.map(v =>
        size(collect_set(when(live, col(v)))).cast(LongType)
          .as(spec.uniqCol(v)))
  }

  /** One micro-batch: merge into key state, maintain the projection,
    * recompute min/max (and distinct counts) for the touched groups.
    * `serve` receives the emitted group events (D where a group
    * emptied) while pinned.
    *
    * All three store commits (key state, projection, view) ride
    * [[BucketedState.commitPool]] and run CONCURRENTLY with each other
    * AND with `serve`: every in-batch read is `beforeBatch`-bounded
    * (the recompute folds pre-batch projection rows with this batch's
    * events IN MEMORY, and `serve` consumes the already-computed
    * events frame), so no stage observes another's v=batchId write —
    * nothing on the critical path waits for a write to land. On a
    * failing batch every in-flight commit is joined before the error
    * propagates, so a retry of the same batchId never races an
    * orphaned merge against its own staging directory. */
  /** Returns the EFFECTIVE change schema the batch was folded under
    * (the pin, possibly wider than the batch after an absorbed DROP) —
    * the schema maintenance passes must read/rewrite the key state
    * with, or a compaction would silently shed a retained column. */
  def applyBatch(batch: DataFrame, batchId: Long, keyStateDir: String,
      projDir: String, viewDir: String, spec: Spec, stateBuckets: Int,
      projBuckets: Int, viewBuckets: Int,
      serve: DataFrame => Unit = _ => ()): StructType = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    val spark = batch.sparkSession
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val pending = scala.collection.mutable.ArrayBuffer.empty[Future[Unit]]
    val pins = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // schema-evolution contract (pin lives with the key state — one per
    // view instance): an ADDITIVE nullable payload column is absorbed
    // (the projection never carries it; pre-batch state reads it as
    // null), a DROP of such a column is absorbed by null-padding the
    // batch to the pinned width (state keeps the column), any
    // key/group/value/distinct or type change fail-stops — see
    // BucketedState.resolveSchema
    val effSchema = BucketedState.resolveSchema(spark, keyStateDir,
      batch.schema, new org.apache.hadoop.fs.Path(viewDir).getName,
      reservedCols = spec.projCols)
    try {
      // the batch feeds several consumers (key listing + broadcast,
      // key-state merge, the image fold) — pin it once instead of
      // re-scanning the change-log parquet per consumer
      val b = BucketedState.conform(batch, effSchema).persist(mem)
      pins += b
      val keys = b.select(spec.keyCols.map(col): _*).distinct()
      // ONE bucket listing per store: the key-state merge writes
      // exactly the batch keys' buckets, so the listing shares with the
      // pre-batch lookup as mergeBatch's touchedHint (the hinted merge
      // also skips re-persisting the already-pinned batch)
      val keyBuckets = BucketedState.touchedBuckets(keys, spec.keyCols,
        stateBuckets)
      // pre-batch images of the batch's keys (version-bounded: a crash
      // replay recomputes byte-identical events)
      val oldState = BucketedState.stateForKeys(spark, keyStateDir,
        effSchema, stateBuckets, spec.keyCols, keys,
        beforeBatch = Some(batchId), touchedHint = Some(keyBuckets))
      pending += Future {
        BucketedState.mergeBatch(b, batchId, keyStateDir,
          spec.keyCols, stateBuckets, touchedHint = Some(keyBuckets))
      }(BucketedState.commitPool)
      val projIdent = spec.groupCols ++ spec.keyCols
      // Per-key OLD and NEW live images in ONE aggregate
      // ([[CdcMerge.oldNewImages]]) — the r14 fusion of the previous
      // window collapse + identity anti-join (two exchanges + a
      // broadcast build) into a single exchange. Projection events
      // then fall out scan-locally: U for a live new image; D for a
      // live old image whose (group, key) identity the new state no
      // longer holds — i.e. the key died or its group moved (null-safe
      // group compare: a group column may legitimately hold null, and
      // a null-unsafe compare would re-retire such a live row every
      // batch).
      val both = CdcMerge.oldNewImages(oldState, b, spec.keyCols,
        spec.projCols)
      val groupMoved = spec.groupCols
        .map(g => !(col(s"_new.$g") <=> col(s"_old.$g")))
        .reduce(_ || _)
      val uEvent = when(col(s"_new.$OpCol") =!= OpDelete,
        struct(spec.projCols.map(c => col(s"_new.$c").as(c))
          :+ lit(OpUpdate).as(OpCol): _*))
      val dEvent = when(col("_old").isNotNull &&
          col(s"_old.$OpCol") =!= OpDelete &&
          (col(s"_new.$OpCol") === OpDelete || groupMoved),
        struct(spec.projCols.map(c => col(s"_old.$c").as(c))
          :+ lit(OpDelete).as(OpCol): _*))
      val projEvents = both
        .select(explode(filter(array(uEvent, dEvent), e => e.isNotNull))
          .as("_e"))
        .select(col("_e.*"))
        .withColumn(SeqCol, lit(batchId))
        // three consumers: touched-bucket listing inside mergeBatch,
        // the touched-group listing, and the in-memory recompute fold
        .persist(mem)
      pins += projEvents
      // the recompute below folds the post-batch state IN MEMORY
      // (pre-batch rows ∪ this batch's events — the same latestByKey
      // collapse the merge applies), so nothing waits on this write
      // landing: the write→read store round-trip leaves the critical
      // path
      val touched = projEvents.select(spec.groupCols.map(col): _*)
        .distinct()
      // group-bucket listings shared the same way: projEvents buckets
      // by group, and its groups ARE `touched` by construction; the
      // view merge's events likewise emit exactly the touched groups
      val projBucketIds = BucketedState.touchedBuckets(touched,
        spec.groupCols, projBuckets)
      val viewBucketIds =
        if (viewBuckets == projBuckets) projBucketIds
        else BucketedState.touchedBuckets(touched, spec.groupCols,
          viewBuckets)
      pending += Future {
        BucketedState.mergeBatch(projEvents, batchId, projDir, projIdent,
          projBuckets, bucketCols = spec.groupCols,
          touchedHint = Some(projBucketIds))
      }(BucketedState.commitPool)
      // post-batch LATEST rows (tombstones included) of ONLY the
      // touched groups: pre-batch projection rows of their buckets
      // (version-bounded) merged with the batch's own events —
      // bit-identical to reading the store back after the commit,
      // minus the dependency. One aggregate over them computes the
      // live count, min/max and distinct AND detects emptied groups
      // (`_rc` = 0 → tombstone, all-null aggregates) — the r14 fusion
      // of the previous separate emptied anti-join probe.
      val preProj = BucketedState.stateForKeys(spark, projDir,
        projSchema(effSchema, spec), projBuckets, projIdent, touched,
        beforeBatch = Some(batchId), bucketCols = spec.groupCols,
        touchedHint = Some(projBucketIds))
      val latest = CdcMerge.latestByKey(
        preProj.unionByName(projEvents), projIdent)
      val agg = latest.groupBy(spec.groupCols.map(col): _*)
        .agg(count(when(col(OpCol) =!= OpDelete, lit(1))).as(RawCnt),
          fusedAggExprs(spec): _*)
      val alive = col(RawCnt) > 0L
      val events = agg.select(
        (spec.groupCols.map(col)
          ++ Seq(when(alive, col(RawCnt)).as(CntCol))
          ++ spec.valueCols.flatMap(v =>
            Seq(col(spec.minCol(v)), col(spec.maxCol(v))))
          ++ spec.distinctCols.map(v =>
            when(alive, col(spec.uniqCol(v))).as(spec.uniqCol(v)))
          ++ Seq(
            when(alive, lit(OpUpdate)).otherwise(lit(OpDelete)).as(OpCol),
            lit(batchId).as(SeqCol))): _*)
        // consumers: the view merge's touched listing + write, and
        // `serve` — pinned so the touched-group recompute runs once
        .persist(mem)
      pins += events
      pending += Future {
        BucketedState.mergeBatch(events, batchId, viewDir, spec.groupCols,
          viewBuckets, touchedHint = Some(viewBucketIds))
      }(BucketedState.commitPool)
      serve(events)
      // all commits land before the pins release (and before the
      // caller's checkpoint commit); failures propagate
      pending.foreach(f => Await.result(f, Duration.Inf))
      effSchema
    } catch {
      case t: Throwable =>
        BucketedState.joinQuietly(pending.toSeq: _*)
        throw t
    } finally pins.foreach(_.unpersist(false))
  }

  /** Start the maintenance stream over a file change log (same source
    * contract as [[CdcStream.start]]). */
  def start(spark: SparkSession, changesDir: String,
      changeSchema: StructType, keyStateDir: String, projDir: String,
      viewDir: String, checkpointDir: String, spec: Spec,
      stateBuckets: Int = 16, projBuckets: Int = 8, viewBuckets: Int = 8,
      maxFilesPerTrigger: Option[Int] = None,
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
        // key-state maintenance under the EFFECTIVE schema applyBatch
        // folded with — after an absorbed DROP the pin is wider than
        // the batch, and compacting under the narrow batch schema
        // would shed the retained column's values
        val eff = applyBatch(batch, batchId, keyStateDir, projDir,
          viewDir, spec, stateBuckets, projBuckets, viewBuckets)
        maintenance.run(spark, keyStateDir, batchId, eff,
          spec.keyCols, Some(stateBuckets))
        maintenance.run(spark, projDir, batchId,
          projSchema(eff, spec),
          spec.groupCols ++ spec.keyCols, Some(projBuckets),
          bucketCols = spec.groupCols)
        maintenance.run(spark, viewDir, batchId,
          viewSchema(eff, spec), spec.groupCols,
          Some(viewBuckets))
      }
      .trigger(trigger)
      .start()
  }

  /** [[start]], plus a real-database serving endpoint — the min/max
    * dashboard table a user hangs off the sync (the gap AggView
    * documents): after each batch's touched-group recompute, the JDBC
    * table is brought to agreement on exactly those groups
    * (delete-then-insert via [[graft.sources.JdbcSink.upsertKeys]];
    * an emptied group is deleted) — database work per trigger is
    * O(touched groups), and the push input is the already-computed
    * event frame. First batch against a missing table bootstraps with
    * a full [[graft.sources.JdbcSink.replace]]. Crash before
    * checkpoint commit replays into the same idempotent push —
    * exactly-once observable serving state, the [[AggView]] argument
    * verbatim. */
  def startToJdbc(spark: SparkSession, changesDir: String,
      changeSchema: StructType, keyStateDir: String, projDir: String,
      viewDir: String, checkpointDir: String, spec: Spec,
      jdbcUrl: String, jdbcTable: String, stateBuckets: Int = 16,
      projBuckets: Int = 8, viewBuckets: Int = 8,
      maxFilesPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow(),
      jdbcOptions: Map[String, String] = Map.empty,
      maintenance: CdcStream.Maintenance = CdcStream.Maintenance())
      : StreamingQuery = {
    var reader = spark.readStream.schema(changeSchema)
    maxFilesPerTrigger.foreach(n =>
      reader = reader.option("maxFilesPerTrigger", n))
    val guarded = CdcMerge.requireKeys(reader.parquet(changesDir),
      spec.keyCols, jdbcTable)
    guarded.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val eff = applyBatch(batch, batchId, keyStateDir, projDir,
          viewDir, spec, stateBuckets, projBuckets, viewBuckets,
          serve = jdbcServe(spark, viewDir, spec, jdbcUrl, jdbcTable,
            jdbcOptions, viewBuckets, batch.schema, batchId))
        maintenance.run(spark, keyStateDir, batchId, eff,
          spec.keyCols, Some(stateBuckets))
        maintenance.run(spark, projDir, batchId,
          projSchema(eff, spec),
          spec.groupCols ++ spec.keyCols, Some(projBuckets),
          bucketCols = spec.groupCols)
        maintenance.run(spark, viewDir, batchId,
          viewSchema(eff, spec), spec.groupCols,
          Some(viewBuckets))
      }
      .trigger(trigger)
      .start()
  }

  /** [[startToJdbc]]'s per-batch push, as a standalone serve function:
    * bring the JDBC table to agreement on exactly this batch's touched
    * groups (delete-then-insert, an emptied group is deleted) or
    * bootstrap a missing table with a full replace. Package-visible so
    * the serving spec can re-invoke the EXACT production push for a
    * crash-replayed batchId and prove it idempotent. */
  private[streaming] def jdbcServe(spark: SparkSession, viewDir: String,
      spec: Spec, jdbcUrl: String, jdbcTable: String,
      jdbcOptions: Map[String, String], viewBuckets: Int,
      changeSchema: StructType, batchId: Long)
      (events: DataFrame): Unit = {
    import graft.sources.JdbcSink
    if (!JdbcSink.tableExists(jdbcUrl, jdbcTable, jdbcOptions)) {
      // bootstrap must not read the view store — its commit is
      // in flight concurrently with serve and a mid-promotion
      // read could mix bucket versions. The post-batch view is
      // folded in memory instead: pre-batch state (version-
      // bounded) ∪ this batch's events, the same LWW collapse
      // the merge applies.
      val post = CdcMerge.latestByKey(
        BucketedState.currentState(spark, viewDir,
          viewSchema(changeSchema, spec), viewBuckets,
          beforeBatch = Some(batchId))
          .unionByName(events),
        spec.groupCols)
        .filter(col(OpCol) =!= OpDelete)
        .drop(OpCol, SeqCol)
      JdbcSink.replace(post, jdbcUrl, jdbcTable, options = jdbcOptions)
    } else {
      val keys = events.select(spec.groupCols.map(col): _*)
      val live = events.filter(col(OpCol) =!= OpDelete)
        .select(spec.outputCols.map(col): _*)
      JdbcSink.upsertKeys(keys, live, spec.groupCols, jdbcUrl,
        jdbcTable, options = jdbcOptions)
    }
  }

  /** The maintained table: `groupCols, n_live, min_*, max_*`. */
  def currentView(spark: SparkSession, viewDir: String,
      changeSchema: StructType, spec: Spec,
      viewBuckets: Int = 8): DataFrame =
    BucketedState.currentView(spark, viewDir,
      viewSchema(changeSchema, spec), viewBuckets)

  /** Recompute-on-read for an ad-hoc group set: min/max over the
    * projection's live rows restricted (bucket-pruned) to `groups` —
    * the serving path when no materialized view row is wanted. */
  def minMaxForGroups(spark: SparkSession, projDir: String,
      changeSchema: StructType, spec: Spec, groups: DataFrame,
      projBuckets: Int = 8): DataFrame =
    BucketedState.viewForKeys(spark, projDir,
      projSchema(changeSchema, spec), projBuckets,
      spec.groupCols ++ spec.keyCols, groups,
      bucketCols = spec.groupCols)
      .groupBy(spec.groupCols.map(col): _*)
      .agg(count(lit(1)).as(CntCol), aggExprs(spec): _*)

  /** Drain the change log and return the final maintained view. */
  def replayToCompletion(spark: SparkSession, changesDir: String,
      changeSchema: StructType, keyStateDir: String, projDir: String,
      viewDir: String, checkpointDir: String, spec: Spec,
      stateBuckets: Int = 16, projBuckets: Int = 8, viewBuckets: Int = 8,
      maxFilesPerTrigger: Option[Int] = None,
      maintenance: CdcStream.Maintenance = CdcStream.Maintenance())
      : DataFrame = {
    val q = start(spark, changesDir, changeSchema, keyStateDir, projDir,
      viewDir, checkpointDir, spec, stateBuckets, projBuckets,
      viewBuckets, maxFilesPerTrigger, maintenance = maintenance)
    q.awaitTermination()
    currentView(spark, viewDir, changeSchema, spec, viewBuckets)
  }
}
