package graft.streaming

import graft.Frontier._
import graft.model.ChangeEvent.{OpCol, SeqCol, OpDelete, OpUpdate}
import graft.operators.{CdcMerge, Dedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Near-dup index maintained under CDC — the composition this engine
  * exists for: the reference replicates a mutating MySQL table
  * (I/U/D), and an LLM corpus built on such a table needs its
  * MinHash-LSH duplicate pairs to FOLLOW the mutations.
  * [[graft.operators.IncrementalDedup]] covers the append-only crawl;
  * this covers the edited corpus: an UPDATE re-signs the document,
  * retires the stale band entries and pairs, and re-pairs the new
  * version against the live corpus; a DELETE retires everything.
  *
  * Three [[BucketedState]] tables under one store dir:
  *   - `sigs`  — key `doc_id`: the live signature (hashed shingle set).
  *   - `bands` — key `(band, key, doc_id)`, BUCKETED BY `(band, key)`:
  *     the LSH posting index. Bucketing by the band key (not the full
  *     row identity) is what makes the probe O(batch): a batch reads
  *     only the band-key buckets its own signatures hash to.
  *   - `pairs` — key `(id, other)`, BUCKETED BY `id`, each pair stored
  *     in BOTH directions: retiring every pair of a changed doc is a
  *     bucket-pruned lookup by that doc's id alone.
  *
  * Per batch, everything read or written is bounded by the batch's key
  * spread (touched buckets), never the corpus: the state lookups are
  * `viewForKeys`/`stateForKeys` (pre-batch versions via `beforeBatch`,
  * so crash-replay reads identical inputs and the merge layer makes
  * re-writes idempotent), and the band probe joins batch band keys
  * against only their own buckets. Sequence discipline: band and pair
  * rows carry engine sequences `2·batchId` (retire) / `2·batchId + 1`
  * (assert) — monotone across batches, retire-below-assert within one,
  * so a pair destroyed and re-established in the same batch survives.
  *
  * The three sub-store commits run CONCURRENTLY: every cross-store
  * read in the batch is `beforeBatch`-bounded (candidate discovery
  * reads the PRE-batch bands/sigs, the pair retire reads the
  * PRE-batch pairs), so no stage observes another's v=batchId write
  * and the commit order never mattered for correctness — serializing
  * them only serialized their fixed job overheads. A crash with some
  * stores advanced replays into identical frames and idempotent
  * re-promotions, the same argument as a crash between two batches.
  */
object DedupIndex {

  /** The shared commit pool ([[BucketedState.commitPool]]) — 3
    * concurrent sub-store commits per batch. */
  private def commitPool = BucketedState.commitPool

  /** Matches the `dedup_minhash` family's parameters, so the final
    * state is oracle-checkable against the same SQL replay. */
  case class Config(n: Int = 3, k: Int = 16, bands: Int = 4,
      threshold: Double = 0.8, sigBuckets: Int = 16,
      bandBuckets: Int = 32, pairBuckets: Int = 16)

  val sigSchema: StructType = StructType.fromDDL(
    "doc_id long, hs array<long>, n_sh long, _op string, _seq long")
  val bandSchema: StructType = StructType.fromDDL(
    "band int, key string, doc_id long, _op string, _seq long")
  val pairSchema: StructType = StructType.fromDDL(
    "id long, other long, jaccard double, _op string, _seq long")

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
      .select(col("bk.band").as("band"), col("bk.key").as("key"),
        col("doc_id"))
  }

  /** One batch's doc-bucket universe plus an upsert flag, from a
    * SINGLE aggregate job (`group by bucket → any non-delete`): the
    * bucket ids feed every store keyed by `doc_id` at `nBuckets`
    * (sigs here; the caller's own doc-state merge in
    * `cdc_corpus_clean`), and the flag drives the deletes-only
    * shortcut without a second `isEmpty` action. The flag is an UPPER
    * bound — computed before the late-duplicate filter, so a batch
    * whose upserts all turn out stale still takes the full path, which
    * merely runs empty frames (never the reverse: a false `false` is
    * impossible since the filtered set only shrinks). */
  final case class BatchProbe(nBuckets: Int, docBuckets: Seq[Int],
      mayHaveUpserts: Boolean)

  def probeBatch(changes: DataFrame, nBuckets: Int): BatchProbe = {
    val rows = changes
      .groupBy(BucketedState.bucketFor(Seq(col("doc_id")), nBuckets)
        .as("_b"))
      .agg(max(col(OpCol) =!= OpDelete).as("_u"))
      .collect()
    BatchProbe(nBuckets, rows.map(_.getInt(0)).toSeq.sorted,
      rows.exists(_.getBoolean(1)))
  }

  /** Apply one micro-batch of document changes
    * (`_op, _seq, doc_id, text`). Multiple events per doc collapse LWW
    * first, so any batch slicing of the same feed converges to the
    * same state (spec-asserted). `probe`: the batch's [[probeBatch]]
    * result when the CALLER already ran it (the cdc_corpus_clean shape
    * shares one listing between this index and its own doc-state
    * merge); must have been computed at `cfg.sigBuckets`. */
  def applyBatch(changes: DataFrame, storeDir: String, batchId: Long,
      cfg: Config = Config(), probe: Option[BatchProbe] = None): Unit = {
    require(cfg.k % cfg.bands == 0,
      s"k=${cfg.k} not divisible by bands=${cfg.bands}")
    probe.foreach(p => require(p.nBuckets == cfg.sigBuckets,
      s"probe computed at ${p.nBuckets} buckets, store uses " +
        s"${cfg.sigBuckets}"))
    val spark = changes.sparkSession
    // same schema-evolution contract as the sibling views
    // (AggView/MinMaxView): an ADDITIVE nullable payload column on the
    // feed is absorbed, and so is its later DROP (the index folds only
    // doc_id/text, which the select below projects regardless); any
    // change to the folded columns or their types fail-stops with the
    // rebuild instruction — see BucketedState.resolveSchema. Pin
    // lives at the store root, one per index instance. The effective
    // schema is not needed further: the fold never touches payload.
    BucketedState.resolveSchema(spark, storeDir, changes.schema,
      new org.apache.hadoop.fs.Path(storeDir).getName,
      reservedCols = Seq("doc_id", "text", OpCol, SeqCol))
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // in-flight sub-store commits, joined on a failing batch so no
    // commit outlives its batch attempt (a retry of the same batchId
    // must never race an orphaned merge on its own staging directory)
    val pending =
      scala.collection.mutable.ArrayBuffer.empty[scala.concurrent.Future[Unit]]
    val arrived = CdcMerge.latestByKey(
      changes.select(col(OpCol), col(SeqCol), col("doc_id"), col("text")),
      Seq("doc_id")).persist(mem)
    try {
      val arrivedKeys = arrived.select("doc_id").distinct()
      // ONE probe job for the whole batch (caller-shared when given):
      // the doc-bucket universe — used by the pre-batch sigs lookup,
      // the sigs merge, and (bucket counts matching) the pair-store
      // probe — plus the deletes-only flag, fused into one aggregate
      // instead of a listing collect + a separate isEmpty action
      val bp = probe.getOrElse(probeBatch(arrived, cfg.sigBuckets))
      val sigBucketIds = bp.docBuckets
      // pre-batch state of the touched docs WITH meta: a batch event at
      // or below the stored sequence is a late duplicate — dropped here,
      // so out-of-order redelivery can never regress bands/pairs (whose
      // engine seqs are batch-monotone and would otherwise let stale
      // text win)
      val oldState = BucketedState.stateForKeys(spark, s"$storeDir/sigs",
          sigSchema, cfg.sigBuckets, Seq("doc_id"), arrivedKeys,
          beforeBatch = Some(batchId), touchedHint = Some(sigBucketIds))
        .persist(mem)
      try {
      val collapsed = arrived
        .join(oldState.select(col("doc_id"),
          col(SeqCol).as("_stored_seq")), Seq("doc_id"), "left")
        .filter(col("_stored_seq").isNull ||
          col(SeqCol) > col("_stored_seq"))
        .drop("_stored_seq")
        .persist(mem)
      try {
      val keys = collapsed.select("doc_id").distinct()
      // pre-batch live signatures of the docs actually advancing
      val oldSigs = oldState
        .join(broadcast(keys), Seq("doc_id"), "left_semi")
        .filter(col(OpCol) =!= OpDelete)
        .drop(OpCol, SeqCol)
      val ups = collapsed.filter(col(OpCol) =!= OpDelete)
      // a deletes-only batch (common in GDPR purge runs) skips signing,
      // band asserts, and pair discovery; the flag rides the probe's
      // aggregate (upper bound — see BatchProbe) instead of its own job
      val hasUpserts = bp.mayHaveUpserts
      val newSigs = Dedup.textSignatures(ups, "doc_id", "text", cfg.n)
        .select(col("doc_id"), col("hs"), col("n_sh"))
        .join(ups.select(col("doc_id"), col(SeqCol)), Seq("doc_id"))
        .persist(mem)
      try {
        // ---- sigs state: assert new versions, tombstone deletes
        val sigTombs = collapsed.filter(col(OpCol) === OpDelete)
          .select(col("doc_id"),
            lit(null).cast("array<long>").as("hs"),
            lit(null).cast("long").as("n_sh"),
            col(OpCol), col(SeqCol))
        val sigRows =
          if (!hasUpserts) sigTombs
          else newSigs
            .select(col("doc_id"), col("hs"), col("n_sh"),
              lit(OpUpdate).as(OpCol), col(SeqCol))
            .unionByName(sigTombs)
        // commit concurrently with the band/pair stages below — every
        // later read of this store is beforeBatch-bounded (see the
        // object doc's commit-concurrency argument)
        import scala.concurrent.{Await, Future}
        val sigsCommit = Future {
          BucketedState.mergeBatch(sigRows, batchId, s"$storeDir/sigs",
            Seq("doc_id"), cfg.sigBuckets,
            touchedHint = Some(sigBucketIds))
        }(commitPool)
        pending += sigsCommit

        // ---- band index: retire the replaced versions' entries the
        // new versions do not re-establish, assert the new entries
        val newBands = bandKeys(newSigs, cfg).persist(mem)
        try {
          // eager checkpoint: consumed by the retire anti-join, its
          // bucket listing, and the merge write — the minhash_sig
          // recompute per consumer would triple the per-row CPU
          val oldBands = bandKeys(oldSigs, cfg).frontier
          val retire = oldBands
            .join(newBands, Seq("band", "key", "doc_id"), "left_anti")
            .select(col("band"), col("key"), col("doc_id"),
              lit(OpDelete).as(OpCol), lit(batchId * 2).as(SeqCol))
          val assertB = newBands
            .select(col("band"), col("key"), col("doc_id"),
              lit(OpUpdate).as(OpCol), lit(batchId * 2 + 1).as(SeqCol))
          // band-bucket universe of this batch's retire ∪ assert rows:
          // retire ⊆ the old versions' band keys, assert = the new
          // versions' — ONE listing job over the tagged union of the
          // pinned band frames (r15: was two separate collects), split
          // back into the NEW set (candidate discovery probes exactly
          // those buckets) and the union (the merge's touchedHint)
          val bandBucketRows = newBands.select(
              BucketedState.bucketFor(Seq(col("band"), col("key")),
                cfg.bandBuckets).as("_b"), lit(true).as("_new"))
            .unionByName(oldBands.select(
              BucketedState.bucketFor(Seq(col("band"), col("key")),
                cfg.bandBuckets).as("_b"), lit(false).as("_new")))
            .groupBy(col("_b")).agg(max(col("_new")).as("_anyNew"))
            .collect()
          val newBandBuckets = bandBucketRows
            .filter(_.getBoolean(1)).map(_.getInt(0)).toSeq
          val allBandBuckets = bandBucketRows.map(_.getInt(0)).toSeq
          // concurrent with discovery: discovery reads the PRE-batch
          // band buckets (beforeBatch = batchId), never this write
          val bandsCommit = Future {
            BucketedState.mergeBatch(retire.unionByName(assertB), batchId,
              s"$storeDir/bands", Seq("band", "key", "doc_id"),
              cfg.bandBuckets, bucketCols = Seq("band", "key"),
              touchedHint = Some(allBandBuckets))
          }(commitPool)
          pending += bandsCommit

          // ---- candidate discovery: batch band keys vs ONLY their own
          // pre-batch band buckets; store entries of docs changed in
          // THIS batch are stale old versions — excluded
          val newPairs = if (!hasUpserts) {
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              org.apache.spark.sql.types.StructType.fromDDL(
                "a long, b long, jaccard double"))
          } else {
            val storeBands = BucketedState.readBuckets(spark,
                s"$storeDir/bands", bandSchema, newBandBuckets,
                beforeBatch = Some(batchId))
              .filter(col(OpCol) =!= OpDelete).drop(OpCol, SeqCol)
              .join(broadcast(keys), Seq("doc_id"), "left_anti")
            // pinned: three consumers (the candIds bucket listing
            // inside viewForKeys, the candIds semi-join broadcast, and
            // the jaccard verify) — unpinned, each re-ran the band
            // read + candidate join (r16: 3 store-band evaluations per
            // batch → 1); released once the verified set is
            // checkpointed below
            val cross = storeBands.as("x").join(newBands.as("y"),
                col("x.band") === col("y.band") &&
                  col("x.key") === col("y.key"))
              .select(least(col("x.doc_id"), col("y.doc_id")).as("a"),
                greatest(col("x.doc_id"), col("y.doc_id")).as("b"))
              .distinct()
              .persist(mem)
            try {
              val candIds = cross
                .select(explode(array(col("a"), col("b"))).as("doc_id"))
                .distinct()
              val sets = newSigs.select(col("doc_id"), col("hs"),
                  col("n_sh"))
                .unionByName(
                  BucketedState.viewForKeys(spark, s"$storeDir/sigs",
                    sigSchema, cfg.sigBuckets, Seq("doc_id"), candIds,
                    beforeBatch = Some(batchId))
                    .join(broadcast(keys), Seq("doc_id"), "left_anti"))
              Dedup.jaccardVerify(cross, sets, cfg.threshold)
                .unionByName(Dedup.minhashDedupPairsFromSets(
                  newSigs.select(col("doc_id"), col("hs"), col("n_sh")),
                  cfg.k, cfg.bands, cfg.threshold))
                .distinct()
                .frontier
            } finally cross.unpersist(false)
          }

          // ---- pair index: retire EVERY stored pair touching a
          // changed doc (both directions), assert the re-verified set.
          // The probe's doc-bucket universe covers the lookup when the
          // pair store shares the sig store's bucket count (both key on
          // doc ids — the default and the cdc_corpus_clean config), so
          // the lookup pays no listing job of its own; a superset hint
          // merely reads a few extra (empty-after-semi-join) buckets.
          val pairProbeHint =
            if (cfg.pairBuckets == cfg.sigBuckets) Some(sigBucketIds)
            else None
          val oldPairRows = BucketedState.stateForKeys(spark,
              s"$storeDir/pairs", pairSchema, cfg.pairBuckets,
              Seq("id", "other"), keys.select(col("doc_id").as("id")),
              beforeBatch = Some(batchId), bucketCols = Seq("id"),
              touchedHint = pairProbeHint)
            .filter(col(OpCol) =!= OpDelete)
            .select(col("id"), col("other"))
            // consumers: both retire directions + the write-bucket
            // listing below — pin so the pair-store read runs once
            .persist(mem)
          try {
          val retireP = oldPairRows
            .unionByName(oldPairRows.select(col("other").as("id"),
              col("id").as("other")))
            .distinct()
            .select(col("id"), col("other"),
              lit(null).cast("double").as("jaccard"),
              lit(OpDelete).as(OpCol), lit(batchId * 2).as(SeqCol))
          val assertP = newPairs
            .select(col("a").as("id"), col("b").as("other"), col("jaccard"))
            .unionByName(newPairs.select(col("b").as("id"),
              col("a").as("other"), col("jaccard")))
            .select(col("id"), col("other"), col("jaccard"),
              lit(OpUpdate).as(OpCol), lit(batchId * 2 + 1).as(SeqCol))
          // write-bucket universe of retire ∪ assert in ONE listing job,
          // handed to the merge as its touchedHint — the merge then
          // evaluates the big retire ∪ assert union exactly once
          // (inside the staged write) instead of persisting it and
          // running its own listing pass over it. The listing is EXACT
          // (r16): retire rows carry exactly oldPairRows' endpoints and
          // assert rows exactly newPairs' — the old `keys` branch was a
          // superset that re-evaluated the collapsed chain AND hinted
          // pairless keys' buckets into empty version rewrites every
          // batch; both frames here are pinned/checkpointed already, so
          // the listing reads caches only
          val pairBucketIds = BucketedState.touchedBuckets(
            oldPairRows.select(col("id"))
              .unionByName(oldPairRows.select(col("other").as("id")))
              .unionByName(newPairs.select(col("a").as("id")))
              .unionByName(newPairs.select(col("b").as("id"))),
            Seq("id"), cfg.pairBuckets)
          BucketedState.mergeBatch(retireP.unionByName(assertP), batchId,
            s"$storeDir/pairs", Seq("id", "other"), cfg.pairBuckets,
            bucketCols = Seq("id"), touchedHint = Some(pairBucketIds))
          } finally oldPairRows.unpersist(false)
          // all three commits must land before the pins release (and
          // before the caller's checkpoint commit)
          Await.result(bandsCommit, scala.concurrent.duration.Duration.Inf)
          Await.result(sigsCommit, scala.concurrent.duration.Duration.Inf)
        } finally newBands.unpersist(false)
      } finally newSigs.unpersist(false)
      } finally collapsed.unpersist(false)
      } finally oldState.unpersist(false)
    } catch {
      case t: Throwable =>
        BucketedState.joinQuietly(pending.toSeq: _*)
        throw t
    } finally arrived.unpersist(false)
  }

  /** Current duplicate pairs among live documents, one canonical row
    * per pair (`a < b`). */
  def currentPairs(spark: SparkSession, storeDir: String,
      cfg: Config = Config()): DataFrame =
    BucketedState.currentView(spark, s"$storeDir/pairs", pairSchema,
        cfg.pairBuckets)
      .filter(col("id") < col("other"))
      .select(col("id").as("a"), col("other").as("b"), col("jaccard"))

  /** Live signatures view (doc_id, hs, n_sh) — the corpus the index
    * currently believes in; spec hook. */
  def currentSigs(spark: SparkSession, storeDir: String,
      cfg: Config = Config()): DataFrame =
    BucketedState.currentView(spark, s"$storeDir/sigs", sigSchema,
      cfg.sigBuckets)

  /** Structured Streaming driver: every micro-batch of the change feed
    * (`_op, _seq, doc_id, text`) folds through [[applyBatch]];
    * `optimizeEvery` > 0 runs the three-state [[optimize]] pass every K
    * batches FIRST (pre-batch, so the batch's own versions are never
    * the ones being swapped) — same auto-maintenance posture as
    * `IncrementalDedup.stream` and `CdcStream`'s gcEvery/optimizeEvery
    * knobs: a week-long stream must not accumulate a version per batch.
    * Caller adds checkpoint/trigger and starts. */
  def stream(changes: DataFrame, storeDir: String,
      cfg: Config = Config(), optimizeEvery: Int = 0)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    changes.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (optimizeEvery > 0 && batchId > 0 && batchId % optimizeEvery == 0)
        optimize(batch.sparkSession, storeDir, cfg)
      applyBatch(batch, storeDir, batchId, cfg)
    }

  /** Maintenance: compact + GC all three states ([[BucketedState
    * .optimize]]); `tombstoneHorizon` in the ENGINE sequence domain
    * (2·batchId) for bands/pairs, the feed's own for sigs. */
  def optimize(spark: SparkSession, storeDir: String, cfg: Config,
      sigHorizon: Option[Long] = None,
      engineHorizon: Option[Long] = None): Unit = {
    BucketedState.optimize(spark, s"$storeDir/sigs", sigSchema,
      cfg.sigBuckets, Seq("doc_id"), sigHorizon)
    BucketedState.optimize(spark, s"$storeDir/bands", bandSchema,
      cfg.bandBuckets, Seq("band", "key", "doc_id"), engineHorizon,
      bucketCols = Seq("band", "key"))
    BucketedState.optimize(spark, s"$storeDir/pairs", pairSchema,
      cfg.pairBuckets, Seq("id", "other"), engineHorizon,
      bucketCols = Seq("id"))
  }
}
