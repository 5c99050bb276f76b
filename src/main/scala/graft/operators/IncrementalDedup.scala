package graft.operators

import graft.Frontier._
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental MinHash-LSH dedup: new documents against a persisted
  * signature store, without re-pairing the whole corpus per ingest.
  *
  * A growing training corpus is deduplicated continuously — each ingest
  * brings a batch of NEW documents that must be checked against
  * everything already accepted. Recomputing batch LSH over the union
  * costs O(corpus) per ingest; this operator keeps the corpus's
  * signatures on disk and makes each ingest cost O(batch + collisions):
  *
  *   - `sigs/`  — one row per stored doc: (doc_id, hs, n_sh), the
  *     sorted shingle-hash set that exact-Jaccard verification needs.
  *     Hive-partitioned by `bucket` = hash(doc_id) % buckets, then
  *     `batch` (dynamic-overwrite unit — see [[ingest]]).
  *   - `bands/` — one row per (doc, band): (doc_id, band, key), the
  *     LSH band keys that candidate generation equi-joins on.
  *     Hive-partitioned by `bucket` = hash(key) % buckets, then
  *     `batch`.
  *   - `pairs/batch=N/` — the pairs each ingest emitted (its audit log
  *     and the return value's backing store).
  *
  * Per batch: signatures and band keys are computed once for the new
  * docs (the fused `hashed_shingles`/`minhash_sig` kernels);
  * within-batch pairs come from the standard banded join; cross pairs
  * join the batch's band keys against ONLY the store partitions whose
  * bucket appears in the batch (partition-pruned scan — the batch's
  * distinct bucket list is ≤ `buckets` values, a bounded driver-side
  * collect, never data-sized). Verification reads store `hs` sets for
  * candidate ids only, again bucket-pruned. The emitted pair set over a
  * replay of disjoint batches is EXACTLY the batch LSH pair set over
  * the unioned corpus: every pair is within one batch or across two,
  * band collision is a per-pair predicate, and verification uses the
  * same per-doc `hs` either way (gated by `dedup_incremental` against
  * the `dedup_minhash` oracle on the same corpus).
  *
  * The reference has no analytics surface; the shape it does have —
  * continuous ingest against accumulated state, exactly-once per batch
  * (river/sync.go's position-tracked apply loop) — is what this
  * reproduces for the dedup pipeline.
  *
  * 100 TB shape: the store shuffles only ids + 60-bit hashes (text
  * never enters), ingest reads `O(batch × bands / buckets)` of the band
  * store per bucket touched, and all joins are equi-joins. Raise
  * `buckets` with corpus size so pruning keeps pace (buckets ≈
  * store-partitions a single batch should touch).
  */
object IncrementalDedup {

  final case class Config(n: Int = 3, k: Int = 16, bands: Int = 4,
      threshold: Double = 0.8, buckets: Int = 32)

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def fs(spark: SparkSession, storeDir: String) =
    new Path(storeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The store's compaction epoch: the smallest batchId [[ingest]] may
    * still write. Every batch below it has been folded into the
    * `batch=-1` base by a [[compact]], so replaying one would pair a
    * batch against its own stored rows — [[ingest]] fail-stops on it.
    * 0 until the first compact. */
  def compactionEpoch(spark: SparkSession, storeDir: String): Long = {
    val p = new Path(s"$storeDir/_compaction_epoch")
    val f = fs(spark, storeDir)
    if (!f.exists(p)) 0L
    else {
      val in = f.open(p)
      try scala.io.Source.fromInputStream(in).mkString.trim.toLong
      finally in.close()
    }
  }

  private def writeEpoch(spark: SparkSession, storeDir: String,
      epoch: Long): Unit = {
    val f = fs(spark, storeDir)
    val tmp = new Path(s"$storeDir/._compaction_epoch.tmp")
    val dst = new Path(s"$storeDir/_compaction_epoch")
    val out = f.create(tmp, true)
    try out.write(epoch.toString.getBytes("UTF-8")) finally out.close()
    f.delete(dst, false)
    f.rename(tmp, dst)
    ()
  }

  /** Band keys (doc_id, band, key) of a `(doc_id, hs, n_sh)` frame —
    * the same key construction [[Dedup.minhashCandidates]] joins on. */
  private def bandKeys(sets: DataFrame, cfg: Config): DataFrame = {
    val r = cfg.k / cfg.bands
    sets.filter(col("n_sh") > 0)
      .withColumn("sig", call_function("minhash_sig", col("hs"), lit(cfg.k)))
      .select(col("doc_id"),
        explode(array((0 until cfg.bands).map { b =>
          struct(lit(b).as("band"),
            concat_ws("_", (0 until r).map(i =>
              element_at(col("sig"), b * r + i + 1).cast("string")): _*)
              .as("key"))
        }: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
  }

  /** Ingest one batch of documents. Appends the batch's signatures and
    * band keys to the store, writes the newly discovered duplicate
    * pairs to `pairs/batch=<batchId>`, and returns those pairs
    * (read back from disk — the result is stable however late it is
    * consumed, even after further ingests). Caller contract: batch doc
    * ids are new (not already in the store) and batches are replayed
    * in order with distinct `batchId`s; REPLAYING a batchId (e.g.
    * after a mid-ingest crash) is safe — its store partitions and pair
    * directory are overwritten, not appended. */
  def ingest(docs: DataFrame, idCol: String, textCol: String,
      storeDir: String, batchId: Long,
      cfg: Config = Config()): DataFrame = {
    require(cfg.k % cfg.bands == 0,
      s"k=${cfg.k} not divisible by bands=${cfg.bands}")
    require(batchId >= 0, s"batchId=$batchId must be >= 0 " +
      "(negative ids are reserved for compacted base partitions)")
    val spark = docs.sparkSession
    val epoch = compactionEpoch(spark, storeDir)
    require(batchId >= epoch,
      s"batchId=$batchId was folded into the compacted base " +
        s"(compaction epoch $epoch): replaying it would pair the " +
        "batch against its own stored rows. Only compact batches " +
        "whose checkpoint is durable.")
    val newSigs = Dedup.textSignatures(docs, idCol, textCol, cfg.n)
      .select(col("doc_id"), col("hs"), col("n_sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val newBands = bandKeys(newSigs, cfg)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // within-batch pairs: the standard banded LSH join
        val within = Dedup.minhashDedupPairsFromSets(
          newSigs, cfg.k, cfg.bands, cfg.threshold)

        // cross pairs: batch band keys vs ONLY the store buckets the
        // batch touches. The bucket list is ≤ cfg.buckets ints.
        val batchBuckets =
          if (!exists(spark, s"$storeDir/bands")) Seq.empty[Int]
          else newBands
            .select(pmod(hash(col("key")), lit(cfg.buckets)).as("bucket"))
            .distinct().collect().map(_.getInt(0)).toSeq
        val cross =
          // empty bucket list = empty batch (or empty store): nothing
          // can cross-pair, and isin() over zero values is ill-formed
          if (batchBuckets.isEmpty) within.limit(0)
          else {
            // batch =!= batchId: on a crash REPLAY the store already
            // holds this batch's own rows — without the exclusion the
            // batch would pair against its stored self (self-pairs at
            // jaccard 1). Both filters are partition-pruning.
            val storeBands = spark.read.parquet(s"$storeDir/bands")
              .filter(col("batch") =!= batchId)
              .filter(col("bucket").isin(batchBuckets: _*))
            val cands = storeBands.as("x")
              .join(newBands.as("y"),
                col("x.band") === col("y.band") &&
                  col("x.key") === col("y.key"))
              .select(least(col("x.doc_id"), col("y.doc_id")).as("a"),
                greatest(col("x.doc_id"), col("y.doc_id")).as("b"))
              // a=b only when a store row carries a batch doc's own id
              // (contract violation or a replay against a compacted
              // base) — never a meaningful pair
              .filter(col("a") =!= col("b"))
              .distinct()
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            try {
              // hs sets for verification: the batch's own, plus store
              // sets for exactly the candidates' bucket partitions
              val candBuckets = cands
                .select(explode(array(col("a"), col("b"))).as("id"))
                .select(pmod(hash(col("id")), lit(cfg.buckets)).as("bucket"))
                .distinct().collect().map(_.getInt(0)).toSeq
              val storeSigs = spark.read.parquet(s"$storeDir/sigs")
                .filter(col("batch") =!= batchId)
                .filter(col("bucket").isin(candBuckets: _*))
                .select(col("doc_id"), col("hs"), col("n_sh"))
              val sets = newSigs.unionByName(storeSigs)
              // eager checkpoint: the pair write below runs after the
              // finally unpersists cands — materialize while the
              // candidate frame is still cached
              Dedup.jaccardVerify(cands, sets, cfg.threshold)
                .frontier
            } finally cands.unpersist(false)
          }

        val emitted = within.unionByName(cross)
        emitted.write.mode("overwrite")
          .parquet(s"$storeDir/pairs/batch=$batchId")

        // The batch lands in the store AFTER pair emission (a batch
        // must never pair against its own store rows), under
        // (bucket, batch) partitions with DYNAMIC overwrite: a crashed
        // ingest replayed with the same batchId replaces exactly its
        // own partitions instead of appending duplicates — re-ingest
        // is idempotent, matching the exactly-once posture of the CDC
        // paths. Bucket stays the LEADING partition column so the
        // per-ingest pruned scans are unaffected.
        newSigs
          .withColumn("bucket", pmod(hash(col("doc_id")), lit(cfg.buckets)))
          .withColumn("batch", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("bucket", "batch")
          .parquet(s"$storeDir/sigs")
        newBands
          .withColumn("bucket", pmod(hash(col("key")), lit(cfg.buckets)))
          .withColumn("batch", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("bucket", "batch")
          .parquet(s"$storeDir/bands")

        spark.read.parquet(s"$storeDir/pairs/batch=$batchId")
      } finally newBands.unpersist(false)
    } finally newSigs.unpersist(false)
  }

  /** All pairs every ingest has emitted so far; empty (with the
    * canonical `(a long, b long, jaccard double)` schema) on a store
    * no ingest has written yet — e.g. a stream that has processed
    * zero batches. */
  def allPairs(spark: SparkSession, storeDir: String): DataFrame =
    if (!exists(spark, s"$storeDir/pairs"))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "a bigint, b bigint, jaccard double"))
    else spark.read.parquet(s"$storeDir/pairs")
      .select("a", "b", "jaccard")

  /** Compact the signature and band stores: fold every (bucket, batch)
    * partition with `batch < belowBatch` into ONE `batch=-1` base
    * partition per bucket, one file each. After B ingests a bucket
    * holds B small partitions that every subsequent scan must list and
    * open — compaction restores O(buckets) files, and the base never
    * matches an ingest's `batch =!= batchId` exclusion (ingest
    * batchIds are required ≥ 0).
    *
    * `belowBatch` is the safety bound for a live stream: at the start
    * of micro-batch N every batch < N is durably committed (Structured
    * Streaming commits N−1 before constructing N), while batch N
    * itself may be a replay whose rows a crashed attempt already
    * stored — those MUST keep their batch identity so the replay's
    * `batch =!= batchId` exclusion and dynamic overwrite still see
    * them. [[stream]]'s auto-compaction passes the current batchId;
    * the default folds everything (offline maintenance, no writer).
    *
    * Maintenance contract (same as BucketedState.optimize): one
    * maintenance writer, no concurrent ingest, and — because
    * compaction erases batch identity — only fold batches whose
    * checkpoint is durable. The COMPACTION EPOCH (max folded batch +
    * 1, persisted in `_compaction_epoch` BEFORE the fold) makes the
    * hazard fail-stop: [[ingest]] rejects any batchId below it rather
    * than silently pairing a batch against its own stored rows.
    * Crash posture: the new layout is staged fully, then swapped in
    * with the previous store held in a trash dir; a crash mid-swap
    * heals on the next [[compact]] (or [[healCompact]]) by rolling the
    * trash back. */
  def compact(spark: SparkSession, storeDir: String,
      belowBatch: Long = Long.MaxValue): Unit = {
    healCompact(spark, storeDir)
    if (exists(spark, s"$storeDir/sigs")) {
      // epoch first: fail-stop protection must be in place before any
      // batch identity is erased (a crash between the two only
      // over-rejects batches the caller asserted were durable)
      // cast: hive partition inference may type small batch values int
      val folded = spark.read.parquet(s"$storeDir/sigs")
        .filter(col("batch") >= 0 && col("batch") < belowBatch)
        .agg(max(col("batch").cast("long"))).collect()(0)
      if (!folded.isNullAt(0)) {
        val epoch = folded.getLong(0) + 1
        if (epoch > compactionEpoch(spark, storeDir))
          writeEpoch(spark, storeDir, epoch)
      }
    }
    Seq("sigs", "bands").foreach { name =>
      val main = new Path(s"$storeDir/$name")
      val fs = main.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(main)) {
        val staging = new Path(s"$storeDir/.$name-staging")
        val trash = new Path(s"$storeDir/.$name-trash")
        fs.delete(staging, true)
        spark.read.parquet(main.toString)
          .withColumn("batch",
            when(col("batch") < belowBatch, lit(-1L))
              .otherwise(col("batch")))
          // hash-repartition ON bucket: each bucket's rows land in one
          // task → the partitioned write emits one file per bucket
          // (per surviving batch value — at most base + in-flight)
          .repartition(col("bucket"))
          .write.mode("overwrite").partitionBy("bucket", "batch")
          .parquet(staging.toString)
        fs.delete(trash, true)
        fs.rename(main, trash)
        fs.rename(staging, main)
        fs.delete(trash, true)
      }
    }
  }

  /** Roll back a compact that crashed mid-swap (main dir missing,
    * trash present). Safe to call any time; [[compact]] calls it. */
  def healCompact(spark: SparkSession, storeDir: String): Unit =
    Seq("sigs", "bands").foreach { name =>
      val p = new Path(s"$storeDir/$name")
      healOne(p.getFileSystem(spark.sparkContext.hadoopConfiguration),
        storeDir, name)
    }

  private def healOne(fs: org.apache.hadoop.fs.FileSystem,
      storeDir: String, name: String): Unit = {
    val main = new Path(s"$storeDir/$name")
    val trash = new Path(s"$storeDir/.$name-trash")
    if (!fs.exists(main) && fs.exists(trash)) { fs.rename(trash, main); () }
  }

  /** Continuous ingest: run [[ingest]] per micro-batch of a streaming
    * document source, with the streaming batchId as the store's batch
    * id. Checkpointed offsets + idempotent per-batch store overwrite
    * (see [[ingest]]) give exactly-once observable store state from
    * at-least-once delivery — the same posture as the CDC paths. The
    * returned query must be started by the caller (set trigger /
    * checkpointLocation on it); pairs accumulate under
    * `storeDir/pairs/` for [[allPairs]].
    *
    * `compactEvery = K` folds the store every K micro-batches (0 =
    * never): without it an unbounded stream accumulates one (bucket,
    * batch) partition per trigger and every ingest's pruned scan must
    * list them all — the small-files death [[compact]] exists to
    * prevent. The fold runs at the START of a batch and is bounded to
    * `belowBatch = batchId`: everything older is durably committed
    * (Structured Streaming commits batch N−1 before constructing N),
    * while a crashed attempt of THIS batch keeps its identity so the
    * replay stays idempotent. */
  def stream(docs: DataFrame, idCol: String, textCol: String,
      storeDir: String, cfg: Config = Config(), compactEvery: Int = 0)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
        compact(batch.sparkSession, storeDir, belowBatch = batchId)
      ingest(batch, idCol, textCol, storeDir, batchId, cfg)
      ()
    }
}
