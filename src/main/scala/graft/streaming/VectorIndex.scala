package graft.streaming

import graft.model.ChangeEvent
import graft.operators.{CdcMerge, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** IVF vector index maintained INCREMENTALLY under a CDC stream — the
  * vector-database half of the replication story: the reference keeps a
  * ClickHouse table in lock-step with MySQL so queries hit fresh data;
  * a 2020s retrieval stack needs the same for an embedding column
  * (RAG corpora, semantic dedup, hard-negative mining), where "the
  * index" must absorb upserts and deletes without a rebuild.
  *
  * Design (the standard IVF contract, made CDC-shaped):
  *
  *   - **Frozen coarse quantizer.** Centroids train ONCE at bootstrap
  *     ([[Similarity.kmeansCentroids]] — deterministic bounded sample)
  *     and persist beside the state. Every later assignment uses the
  *     frozen centroids, exactly like a production IVF index whose
  *     lists are fixed until an explicit retrain/rebuild; drift is an
  *     operational re-bootstrap, not a per-batch mutation.
  *   - **Assignment at ingest.** Each change event's vector is assigned
  *     its nearest-centroid list in the scan that ingests it (broadcast
  *     literal centroids, codegen'd argmax — no shuffle), and the
  *     assignment rides the state row. An update that moves a vector
  *     re-assigns on the new value; the LWW merge retires the old row,
  *     list membership moves with it. Deletes tombstone as usual.
  *   - **State = [[BucketedState]] keyed by the vector id**, so the
  *     merge path stays O(batch): a micro-batch rewrites only the
  *     key-buckets its ids hash to, never the corpus. The IVF list id
  *     is a DATA column; the serving scan prunes on it at row-group
  *     level (the OPTIMIZE pass clusters each bucket's file by list id
  *     — `bucket ∈ probes` then skips most row groups via parquet
  *     min/max stats).
  *   - **Serving** = [[Similarity.ivfTopKAssigned]] over the live view:
  *     probe the `nprobe` nearest lists, score only their members.
  *
  * Replay/crash semantics are inherited wholesale from the state store:
  * assignment is a pure function of the event's vector and the frozen
  * centroids, so a replayed batch writes byte-identical rows.
  */
object VectorIndex {
  import ChangeEvent.{OpCol, SeqCol, OpDelete}

  final case class Conf(dim: Int = 64, nlist: Int = 16, nprobe: Int = 4,
      stateBuckets: Int = 16, idCol: String = "vec_id",
      vecCol: String = "embedding", trainSample: Int = 2048)

  private val ListCol = "ivf_list"

  /** Stored state schema: id, vector (as ingested), assigned list,
    * CDC meta. */
  def stateSchema(changeSchema: StructType, conf: Conf): StructType =
    StructType(Seq(
      changeSchema(conf.idCol),
      changeSchema(conf.vecCol),
      StructField(ListCol, IntegerType),
      StructField(OpCol, StringType),
      StructField(SeqCol, LongType)))

  private def centroidsPath(indexDir: String) = s"$indexDir/centroids"

  /** Train and freeze the coarse quantizer on `corpus`, seed the state
    * with it as version 0 (every row an insert at `snapshotSeq`), and
    * return the centroids. The stream starts on top, exactly like
    * [[CdcStream.bootstrap]]'s snapshot hand-off. */
  def bootstrap(corpus: DataFrame, indexDir: String, conf: Conf,
      snapshotSeq: Long = 0L): Array[Array[Double]] = {
    val spark = corpus.sparkSession
    val cents = Similarity.kmeansCentroids(corpus, conf.dim, conf.nlist,
      idCol = conf.idCol, vecCol = conf.vecCol,
      trainSample = conf.trainSample)
    import spark.implicits._
    cents.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
      .toDF("cidx", "centroid")
      .coalesce(1).write.mode("overwrite")
      .parquet(centroidsPath(indexDir))
    val seed = corpus
      .withColumn(OpCol, lit(ChangeEvent.OpInsert))
      .withColumn(SeqCol, lit(snapshotSeq))
    applyBatch(seed, -1L, indexDir, conf, Some(cents))
    cents
  }

  /** The frozen quantizer, reloaded. */
  def centroids(spark: SparkSession, indexDir: String)
      : Array[Array[Double]] =
    spark.read.parquet(centroidsPath(indexDir))
      .orderBy(col("cidx"))
      .collect()
      .map(_.getSeq[Double](1).toArray)

  /** One micro-batch: assign each event's vector under the frozen
    * centroids (delete events carry no vector — null list), merge by
    * id. O(batch) end to end. */
  def applyBatch(batch: DataFrame, batchId: Long, indexDir: String,
      conf: Conf, cached: Option[Array[Array[Double]]] = None): Unit = {
    val cents = cached.getOrElse(centroids(batch.sparkSession, indexDir))
    val assigned = batch.select(
      col(conf.idCol), col(conf.vecCol),
      when(col(OpCol) =!= OpDelete,
        Similarity.nearestCentroid(
          col(conf.vecCol).cast("array<double>"), cents, native = true)
          .cast("int"))
        .otherwise(lit(null).cast("int")).as(ListCol),
      col(OpCol), col(SeqCol))
    BucketedState.mergeBatch(assigned, batchId, s"$indexDir/state",
      Seq(conf.idCol), conf.stateBuckets)
  }

  /** Start continuous maintenance over a file change log (same source
    * contract as [[CdcStream.start]]); the change schema is
    * `idCol, vecCol, _op, _seq`. */
  def start(spark: SparkSession, changesDir: String,
      changeSchema: StructType, indexDir: String, checkpointDir: String,
      conf: Conf, maxFilesPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow(),
      maintenance: CdcStream.Maintenance = CdcStream.Maintenance())
      : StreamingQuery = {
    val cents = centroids(spark, indexDir)
    var reader = spark.readStream.schema(changeSchema)
    maxFilesPerTrigger.foreach(n =>
      reader = reader.option("maxFilesPerTrigger", n))
    val guarded = CdcMerge.requireKeys(reader.parquet(changesDir),
      Seq(conf.idCol), new org.apache.hadoop.fs.Path(indexDir).getName)
    guarded.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, indexDir, conf, Some(cents))
        maintenance.run(spark, s"$indexDir/state", batchId,
          stateSchema(batch.schema, conf), Seq(conf.idCol),
          Some(conf.stateBuckets))
      }
      .trigger(trigger)
      .start()
  }

  /** Maintenance pass: compact each key-bucket's latest version to one
    * file SORTED BY the IVF list id (plus version GC / tombstone
    * expiry, [[BucketedState.optimize]]) — after it, a serving scan's
    * `bucket ∈ probes` predicate skips non-probed lists at parquet
    * row-group level via min/max stats. */
  def optimize(spark: SparkSession, indexDir: String,
      changeSchema: StructType, conf: Conf,
      tombstoneHorizon: Option[Long] = None,
      keepVersions: Int = 2): Unit =
    BucketedState.optimize(spark, s"$indexDir/state",
      stateSchema(changeSchema, conf), conf.stateBuckets,
      Seq(conf.idCol), tombstoneHorizon, keepVersions,
      clusterBy = Seq(ListCol))

  /** The live indexed corpus: `(neighbor_id, cv, bucket)` — the shape
    * [[Similarity.ivfTopKAssigned]] serves from. */
  def indexedView(spark: SparkSession, indexDir: String,
      changeSchema: StructType, conf: Conf): DataFrame =
    BucketedState.currentView(spark, s"$indexDir/state",
      stateSchema(changeSchema, conf), conf.stateBuckets)
      .select(col(conf.idCol).as("neighbor_id"),
        col(conf.vecCol).cast("array<double>").as("cv"),
        col(ListCol).as("bucket"))

  /** Top-k over the maintained index: probe the `nprobe` nearest
    * frozen-centroid lists, score only their members. */
  def topK(spark: SparkSession, indexDir: String,
      changeSchema: StructType, queries: DataFrame, k: Int, conf: Conf,
      roundTo: Int = 4): DataFrame =
    Similarity.ivfTopKAssigned(
      indexedView(spark, indexDir, changeSchema, conf), queries,
      centroids(spark, indexDir), k, conf.nprobe, conf.idCol,
      conf.vecCol, roundTo, native = true)
}
