package graft.streaming

import graft.operators.CdcMerge
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Partition-scoped CDC state: the 100 TB answer to "a micro-batch must
  * not rewrite the whole target".
  *
  * Layout: `targetDir/bucket=<b>/v=<batchId>/` — state is hash-bucketed
  * by primary key (`pmod(hash(keys), nBuckets)`), each bucket versioned
  * independently. A micro-batch:
  *
  *   1. computes the buckets its keys touch (distinct over the batch —
  *      tiny),
  *   2. reads ONLY those buckets' latest state,
  *   3. merges (same latest-by-`_seq` collapse as the flat path) and
  *      writes all touched buckets in ONE partitioned job,
  *   4. promotes each staged bucket dir to `bucket=b/v=<batchId>` with a
  *      rename + `_GRAFT_OK` marker.
  *
  * Untouched buckets are never read or written, so per-batch cost scales
  * with the batch's key spread, not the table size. Replaying a batch
  * after a crash re-stages and re-promotes the same versions from the
  * same pre-batch state — idempotent, like the flat versioned layout
  * (readers only trust marker-complete versions). Bucket count is fixed
  * at table creation (a resize is a rewrite — same rule as any hash
  * layout).
  */
object BucketedState {
  import graft.model.ChangeEvent.{OpCol, SeqCol, OpDelete}

  /** Shared pool for concurrent store commits within one micro-batch
    * (DedupIndex's three sub-stores, the views' key-state merges).
    * Safe whenever every cross-store read in the batch is
    * `beforeBatch`-bounded: no stage observes another's v=batchId
    * write, so commit order never mattered — serializing them only
    * serialized their fixed job overheads. Daemon threads: a dying
    * JVM never hangs on the pool. */
  private[streaming] lazy val commitPool
      : scala.concurrent.ExecutionContextExecutorService =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newCachedThreadPool(r => {
        val t = new Thread(r, "graft-store-commit")
        t.setDaemon(true)
        t
      }))

  /** Join in-flight commit futures on a FAILING batch: `Await.ready`
    * each (swallowing its outcome — the batch's own failure is the one
    * to propagate) so no commit outlives its batch attempt. Without
    * this, an in-process retry of the same batchId can run a second
    * `mergeBatch` against the same store's `.staging-v<batchId>`
    * directory concurrently with the orphaned first — corrupting the
    * staged bucket promotion. The success path still `Await.result`s
    * (propagating commit failures); this is the failure-path
    * counterpart. */
  private[streaming] def joinQuietly(
      fs: scala.concurrent.Future[_]*): Unit = {
    // An interrupt mid-join (stream/task cancellation) must not abandon
    // the REMAINING futures: re-setting the flag inside the loop would
    // make every later Await.ready throw immediately, letting in-flight
    // commits outlive the batch attempt — the exact orphaned-merge race
    // this helper exists to prevent. Record the interrupt (clearing the
    // flag), keep joining until every future is done, re-interrupt last.
    var interrupted = Thread.interrupted()
    fs.foreach { f =>
      var joined = false
      while (!joined) {
        try {
          scala.concurrent.Await.ready(f,
            scala.concurrent.duration.Duration.Inf)
          joined = true
        } catch {
          case _: InterruptedException => interrupted = true
          case _: Throwable => joined = true
        }
      }
    }
    if (interrupted) Thread.currentThread().interrupt()
  }

  private val Marker = "_GRAFT_OK"
  private val BucketTag = "_gb" // staging partition column
  private val SchemaPin = "_GRAFT_VIEW_SCHEMA"

  /** Schema-evolution contract for the stateful VIEWS
    * (AggView/MinMaxView/DedupIndex): the first batch writes the
    * change-stream schema DDL to `<dir>/_GRAFT_VIEW_SCHEMA`; every
    * later batch — including after a restart — must either match it
    * exactly or be an absorbable DDL step. Returns the EFFECTIVE
    * schema the batch should be folded under (see [[conform]]):
    *
    *   - ADD of a nullable, non-reserved column (reservedCols = the
    *     view's key/group/measure/value columns — a column the view
    *     actually folds cannot appear mid-stream, its historical state
    *     would be silently wrong): absorbed; pre-batch state parquet is
    *     read under the wider schema, so old rows carry null, and the
    *     pin advances to the widened DDL (atomically) so a later TYPE
    *     change of that column still fail-stops.
    *   - DROP of a non-reserved payload column (r15): absorbed the
    *     other way round — the pin KEEPS the column (state keeps it;
    *     existing bucket versions still hold its values) and the
    *     narrower batch is null-padded up to the pinned width by
    *     [[conform]]. A later re-ADD with the same type simply starts
    *     populating it again; a re-ADD with a different type still
    *     fail-stops against the retained pin entry. This closes the
    *     posture gap vs the reference, which refreshes TableInfo on
    *     ANY DDL — including DROP COLUMN — and keeps syncing
    *     (river/sync.go:54-60, river/river.go:166-180).
    *
    * Everything else — a reserved column dropped or type-changed, a
    * new column that is reserved or non-nullable — fail-stops with a
    * rebuild instruction: the projection/delta state was built under
    * the old column set, and folding such batches onto it would
    * silently mix incompatible images (the fail-stop half of the
    * reference's posture; a view has no TableInfo replay). Idempotent
    * under crash-replay: the pin's content is a pure function of the
    * schema progression (a drop never rewrites it, an add widens it
    * deterministically). */
  def resolveSchema(spark: SparkSession, dir: String,
      schema: StructType, what: String,
      reservedCols: Seq[String] = Nil): StructType = {
    val f = fs(spark, dir)
    val p = new Path(dir, SchemaPin)
    val ddl = schema.toDDL
    // Atomic pin write: create-then-write is two steps, and a crash
    // between them leaves an empty pin that would fail-stop every later
    // batch even with the original schema. Stage to a temp name and
    // rename into place (atomic on HDFS/local FS); an empty pin read
    // back (pre-fix leftover) is treated as absent and rewritten.
    def writePin(d: String): Unit = {
      f.mkdirs(new Path(dir))
      val tmp = new Path(dir, s"$SchemaPin.tmp")
      val out = f.create(tmp, true)
      try out.write(d.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      f.delete(p, false)
      f.rename(tmp, p)
      ()
    }
    def fail(stored: String): Nothing = throw new IllegalStateException(
      s"$what: change-stream schema evolved mid-stream — the view's " +
        s"state was built under [$stored] but this batch carries " +
        s"[$ddl]. Only an additive nullable non-key, non-aggregated " +
        "column (or a DROP of such a column) can be absorbed; for " +
        "this change the state is incompatible — rebuild the view " +
        "from a fresh snapshot (drop its store and checkpoint " +
        "directories and replay).")
    if (!f.exists(p)) { writePin(ddl); schema }
    else {
      val in = f.open(p)
      val stored =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      if (stored.isEmpty) { writePin(ddl); schema }
      else if (stored == ddl) schema
      else {
        val storedSchema =
          try StructType.fromDDL(stored) catch {
            case _: Exception => fail(stored)
          }
        val byName = schema.fields.map(fd => fd.name -> fd).toMap
        // every pinned field: identical type if present; if absent, a
        // reserved (folded) column fail-stops, a payload column is an
        // absorbed DROP (kept in the pin, null-padded by conform)
        storedSchema.fields.foreach { old =>
          byName.get(old.name) match {
            case Some(fd) if fd.dataType == old.dataType => ()
            case Some(_) => fail(stored)
            case None if reservedCols.contains(old.name) => fail(stored)
            case None => ()
          }
        }
        // every new field: nullable and non-reserved, else fail-stop
        val storedNames = storedSchema.fieldNames.toSet
        val added = schema.fields.filterNot(fd => storedNames(fd.name))
        added.foreach(fd =>
          if (!fd.nullable || reservedCols.contains(fd.name)) fail(stored))
        val effective = StructType(storedSchema.fields ++ added)
        if (added.nonEmpty) writePin(effective.toDDL)
        effective
      }
    }
  }

  /** Project `batch` onto the effective schema [[resolveSchema]]
    * returned: pinned columns the batch no longer carries (an absorbed
    * DROP) are null-padded at the pinned type, so every state union
    * and merge below still sees the full pinned width. A no-op when
    * the batch already matches. */
  def conform(batch: DataFrame, effective: StructType): DataFrame =
    if (batch.schema == effective) batch
    else {
      val have = batch.columns.toSet
      batch.select(effective.fields.map(fd =>
        if (have(fd.name)) col(fd.name)
        else lit(null).cast(fd.dataType).as(fd.name)).toSeq: _*)
    }

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def bucketExpr(keyCols: Seq[String], nBuckets: Int) =
    pmod(hash(keyCols.map(col): _*), lit(nBuckets))

  /** The bucket a row lands in — public so index layers
    * ([[DedupIndex]]) can compute touched buckets for probe reads
    * without round-tripping through a keys frame. Must stay in lockstep
    * with the layout's `bucketExpr`. */
  def bucketFor(cols: Seq[org.apache.spark.sql.Column],
      nBuckets: Int): org.apache.spark.sql.Column =
    pmod(hash(cols: _*), lit(nBuckets))

  /** Effective bucketing columns: `bucketCols` when given (must be a
    * PREFIX-semantics subset of the row identity — rows sharing
    * `bucketCols` co-locate, enabling secondary-key probe pruning),
    * otherwise the full `keyCols`. A state's choice is fixed at table
    * creation, like `nBuckets`. */
  private def effBucketCols(keyCols: Seq[String],
      bucketCols: Seq[String]): Seq[String] =
    if (bucketCols.isEmpty) keyCols else bucketCols

  /** Latest marker-complete version of one bucket, optionally below a
    * replay horizon. */
  private def latestVersion(spark: SparkSession, targetDir: String,
      bucket: Int, beforeBatch: Option[Long]): Option[Long] = {
    val dir = new Path(s"$targetDir/bucket=$bucket")
    val f = fs(spark, targetDir)
    if (!f.exists(dir)) None
    else {
      val vs = f.listStatus(dir).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
        .filter(s => f.exists(new Path(s.getPath, Marker)))
        .map(_.getPath.getName.stripPrefix("v=").toLong)
        .sorted
      beforeBatch.map(b => vs.filter(_ < b)).getOrElse(vs).lastOption
    }
  }

  /** State of the given buckets (payload + meta columns, no bucket
    * column — it is derivable from the keys). */
  def readBuckets(spark: SparkSession, targetDir: String,
      stateSchema: StructType, buckets: Seq[Int],
      beforeBatch: Option[Long] = None): DataFrame = {
    val paths = buckets.flatMap(b =>
      latestVersion(spark, targetDir, b, beforeBatch)
        .map(v => s"$targetDir/bucket=$b/v=$v"))
    if (paths.isEmpty) {
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stateSchema)
    } else spark.read.schema(stateSchema).parquet(paths: _*)
  }

  /** Merge one micro-batch; rewrites only the buckets the batch touches.
    *
    * `touchedHint`: the touched-bucket ids when the CALLER already knows
    * them (every maintained view computes its batch's key/group set
    * anyway, and the buckets of a computed event frame are a pure
    * function of that set). With the hint the effective frame is
    * evaluated exactly ONCE — inside the staged write — instead of
    * twice (a listing pass to learn the buckets, then the write), which
    * for a COMPUTED batch (StreamScd's repacked histories, AggView's
    * delta fold) halves the per-batch plan executions. CONTRACT: the
    * hint must cover every bucket the effective frame's rows hash to —
    * a staged bucket outside the hint would never be promoted (silent
    * row loss); a hinted bucket with no rows merely rewrites itself.
    * Rows here are keyed work derived from batch keys, so the caller's
    * key/group bucket set is exactly right. */
  def mergeBatch(batch: DataFrame, batchId: Long, targetDir: String,
      keyCols: Seq[String], nBuckets: Int, ignoreUpdates: Boolean = false,
      ignoreDeletes: Boolean = false,
      tombstoneHorizon: Option[Long] = None,
      bucketCols: Seq[String] = Nil,
      touchedHint: Option[Seq[Int]] = None): Unit = {
    val bCols = effBucketCols(keyCols, bucketCols)
    val spark = batch.sparkSession
    val filtered = CdcMerge.filterOps(batch, ignoreUpdates, ignoreDeletes)
    // without a hint the frame is evaluated twice (touched-bucket
    // listing + merged write) — pinned so the second pass reads cache
    val effective =
      if (touchedHint.isEmpty)
        filtered.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else filtered
    try {
    // distinct: a duplicated hint entry would run the promote loop twice
    // for that bucket — the second pass would delete the just-promoted
    // version dir, find no staged src, and replace it with an empty
    // marker-complete version (silent row loss). The contract only
    // requires coverage, so normalize here rather than trusting callers.
    val touched = touchedHint.map(_.distinct.sorted.toArray).getOrElse(effective
      .select(bucketExpr(bCols, nBuckets).as(BucketTag))
      .distinct().collect().map(_.getInt(0)).sorted)
    if (touched.isEmpty) return
    val state = readBuckets(spark, targetDir, effective.schema,
      touched.toSeq, beforeBatch = Some(batchId))
    val staging = s"$targetDir/.staging-v$batchId"
    val merged = CdcMerge.latestByKey(state.unionByName(effective), keyCols)
    val gced = tombstoneHorizon match {
      case Some(h) =>
        merged.filter(!(col(OpCol) === OpDelete && col(SeqCol) <= h))
      case None => merged
    }
    gced
      .withColumn(BucketTag, bucketExpr(bCols, nBuckets))
      .write.mode("overwrite").partitionBy(BucketTag).parquet(staging)
    val f = fs(spark, targetDir)
    touched.foreach { b =>
      val src = new Path(s"$staging/$BucketTag=$b")
      val dstDir = new Path(s"$targetDir/bucket=$b")
      val dst = new Path(dstDir, s"v=$batchId")
      f.mkdirs(dstDir)
      if (f.exists(dst)) f.delete(dst, true) // crash-replay leftover
      if (f.exists(src)) f.rename(src, dst)
      else f.mkdirs(dst) // hinted/touched but merged-empty
      f.create(new Path(dst, Marker)).close()
    }
    f.delete(new Path(staging), true)
    } finally if (touchedHint.isEmpty) effective.unpersist(false)
  }

  /** Drop per-bucket versions older than the newest `keep`
    * marker-complete versions. Mirrors `latestVersion`'s marker filter:
    * an unmarked directory (crash between rename and marker creation) is
    * garbage to delete, never a version to retain — otherwise a crash
    * leftover could count toward `keep` and push out the newest version
    * a reader actually trusts.
    */
  def gcVersions(spark: SparkSession, targetDir: String, nBuckets: Int,
      keep: Int = 2): Int = {
    require(keep >= 1)
    val f = fs(spark, targetDir)
    (0 until nBuckets).map { b =>
      val dir = new Path(s"$targetDir/bucket=$b")
      if (!f.exists(dir)) 0
      else {
        val (complete, unmarked) = f.listStatus(dir).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
          .map(_.getPath.getName.stripPrefix("v=").toLong)
          .sorted
          .partition(v => f.exists(new Path(s"$targetDir/bucket=$b/v=$v",
            Marker)))
        // an unmarked version newer than every complete one may be a
        // rename mid-flight from a live writer — leave it alone
        val doomed = complete.dropRight(keep) ++
          unmarked.filter(v => complete.lastOption.exists(v < _))
        doomed.foreach(v => f.delete(new Path(s"$targetDir/bucket=$b/v=$v"),
          true))
        doomed.size
      }
    }.sum
  }

  /** OPTIMIZE: one maintenance pass that (1) compacts every bucket's
    * LATEST complete version to a single file — a micro-batch write fans
    * a bucket out to one file per shuffle partition, so after N batches
    * a hot bucket holds O(N × partitions) small files — (2) drops
    * delete tombstones at or below `tombstoneHorizon` (safe once the
    * source can no longer replay events that old — the engine-side
    * `OPTIMIZE ... FINAL` of the ReplacingMergeTree sink the reference
    * documents, README.md:56), and (3) GCs versions older than the
    * newest `keepVersions` per bucket.
    *
    * Crash-safe: the compacted data stages under `.optimize-staging`,
    * then each bucket swaps via rename-to-trash → rename-in → marker →
    * drop-trash; a crash mid-swap leaves either the trash copy (restored
    * on the next optimize before anything else happens) or the
    * marker-complete new version — never neither. `keepVersions >= 2`
    * (default) also preserves the pre-batch version an in-flight
    * streaming replay would read; use 1 only when the stream is stopped
    * or its last checkpoint is known durable. Single maintenance writer
    * at a time, same rule as the merge path.
    */
  /** `clusterBy`: sort each compacted bucket file by these DATA columns
    * (e.g. [[VectorIndex]]'s IVF list id) so a serving scan's filter on
    * them prunes at parquet row-group level via min/max stats — the
    * bucketed layout's answer to secondary-predicate locality. */
  def optimize(spark: SparkSession, targetDir: String,
      stateSchema: StructType, nBuckets: Int, keyCols: Seq[String],
      tombstoneHorizon: Option[Long] = None,
      keepVersions: Int = 2,
      clusterBy: Seq[String] = Nil,
      bucketCols: Seq[String] = Nil): Unit = {
    val bCols = effBucketCols(keyCols, bucketCols)
    val f = fs(spark, targetDir)
    // recovery from a previous crashed optimize: a trash dir whose new
    // version is not marker-complete means the swap died mid-flight —
    // restore the old version before touching anything
    (0 until nBuckets).foreach { b =>
      val dir = new Path(s"$targetDir/bucket=$b")
      if (f.exists(dir)) {
        f.listStatus(dir).toSeq
          .filter(s => s.isDirectory &&
            s.getPath.getName.startsWith("trash-v="))
          .foreach { tr =>
            val vd = new Path(dir, tr.getPath.getName.stripPrefix("trash-"))
            if (f.exists(new Path(vd, Marker))) f.delete(tr.getPath, true)
            else {
              if (f.exists(vd)) f.delete(vd, true)
              f.rename(tr.getPath, vd)
            }
          }
      }
    }
    val latest: Seq[(Int, Long)] = (0 until nBuckets).flatMap(b =>
      latestVersion(spark, targetDir, b, None).map(b -> _))
    if (latest.isEmpty) return
    val paths = latest.map { case (b, v) => s"$targetDir/bucket=$b/v=$v" }
    val state = spark.read.schema(stateSchema).parquet(paths: _*)
    val gced = tombstoneHorizon match {
      case Some(h) =>
        state.filter(!(col(OpCol) === OpDelete && col(SeqCol) <= h))
      case None => state
    }
    val staging = s"$targetDir/.optimize-staging"
    f.delete(new Path(staging), true)
    gced
      .withColumn(BucketTag, bucketExpr(bCols, nBuckets))
      // hash-repartition ON the bucket column: every bucket's rows land
      // in exactly one task, so the partitioned write emits ONE file
      // per bucket
      .repartition(col(BucketTag))
      .sortWithinPartitions((BucketTag +: clusterBy).map(col): _*)
      .write.mode("overwrite").partitionBy(BucketTag).parquet(staging)
    latest.foreach { case (b, v) =>
      val src = new Path(s"$staging/$BucketTag=$b")
      val dir = new Path(s"$targetDir/bucket=$b")
      val dst = new Path(dir, s"v=$v")
      val trash = new Path(dir, s"trash-v=$v")
      f.delete(trash, true)
      f.rename(dst, trash)
      if (f.exists(src)) f.rename(src, dst)
      else f.mkdirs(dst) // whole bucket was expired tombstones
      f.create(new Path(dst, Marker)).close()
      f.delete(trash, true)
    }
    f.delete(new Path(staging), true)
    gcVersions(spark, targetDir, nBuckets, keep = keepVersions)
    ()
  }

  /** Full state (all buckets' latest complete versions); `beforeBatch`
    * bounds every bucket's version below a replay horizon — the
    * pre-batch snapshot a batch can fold its own events onto without
    * waiting for (or observing) the batch's concurrent commit. */
  def currentState(spark: SparkSession, targetDir: String,
      stateSchema: StructType, nBuckets: Int,
      beforeBatch: Option[Long] = None): DataFrame =
    readBuckets(spark, targetDir, stateSchema, 0 until nBuckets,
      beforeBatch)

  /** Live rows only, meta dropped. */
  def currentView(spark: SparkSession, targetDir: String,
      stateSchema: StructType, nBuckets: Int): DataFrame =
    currentState(spark, targetDir, stateSchema, nBuckets)
      .filter(col(OpCol) =!= OpDelete)
      .drop(OpCol, SeqCol)

  /** Raw state rows (tombstones and `_op`/`_seq` included) for exactly
    * the given keys, reading ONLY the buckets those keys hash to: the
    * touched buckets are listed from the tiny key frame (bounded driver
    * collect, ≤ nBuckets ints), their latest versions scanned once, and
    * the scan semi-joined down to the keys via broadcast. `beforeBatch`
    * bounds the version per bucket so a crash-replay of batch N reads
    * the identical pre-batch state — the lookup [[AggView]]'s delta
    * maintenance replays idempotently on top of. */
  /** Touched-bucket ids of a keys frame (bounded collect, ≤ nBuckets
    * ints) — public so a caller can run the listing ONCE and share it
    * between [[stateForKeys]] and [[mergeBatch]]'s `touchedHint`. */
  def touchedBuckets(keys: DataFrame, bucketingCols: Seq[String],
      nBuckets: Int): Seq[Int] =
    keys.select(bucketExpr(bucketingCols, nBuckets).as(BucketTag))
      .distinct().collect().map(_.getInt(0)).toSeq

  def stateForKeys(spark: SparkSession, targetDir: String,
      stateSchema: StructType, nBuckets: Int, keyCols: Seq[String],
      keys: DataFrame, beforeBatch: Option[Long] = None,
      bucketCols: Seq[String] = Nil,
      touchedHint: Option[Seq[Int]] = None): DataFrame = {
    // for a bucketCols state the keys frame may carry ONLY the bucket
    // columns (a secondary-key lookup: "every row whose bucketCols
    // match"); the semi-join is on whatever columns the frame has
    val bCols = effBucketCols(keyCols, bucketCols)
    require(bCols.forall(keys.columns.contains),
      s"stateForKeys: keys frame ${keys.columns.toSeq} must carry the " +
        s"bucketing columns $bCols")
    val touched = touchedHint.getOrElse(
      touchedBuckets(keys, bCols, nBuckets))
    // null-safe probe: a key/bucket column may legitimately hold null
    // (e.g. a view grouped on a derivable-null expression). `hash(null)`
    // is a real bucket, so the row is IN the store — a null-unsafe
    // semi-join would drop it here and the caller would treat the row
    // as absent every batch (re-emitting its events forever).
    val st = readBuckets(spark, targetDir, stateSchema, touched,
      beforeBatch).alias("__st")
    val ks = broadcast(keys.alias("__ks"))
    st.join(ks,
        keys.columns.map(c => col(s"__st.$c") <=> col(s"__ks.$c"))
          .reduce(_ && _),
        "left_semi")
      .select(stateSchema.fieldNames.map(col): _*)
  }

  /** Live rows for exactly the given keys — [[stateForKeys]] minus
    * tombstones and meta; the O(batch) state lookup behind the JDBC
    * delta push ([[CdcStream.startToJdbc]]). */
  def viewForKeys(spark: SparkSession, targetDir: String,
      stateSchema: StructType, nBuckets: Int, keyCols: Seq[String],
      keys: DataFrame, beforeBatch: Option[Long] = None,
      bucketCols: Seq[String] = Nil): DataFrame =
    stateForKeys(spark, targetDir, stateSchema, nBuckets, keyCols, keys,
      beforeBatch, bucketCols)
      .filter(col(OpCol) =!= OpDelete)
      .drop(OpCol, SeqCol)
}
