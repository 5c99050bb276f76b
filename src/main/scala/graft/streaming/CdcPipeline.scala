package graft.streaming

import graft.config.{Rule, SyncConfig}
import graft.model.{Catalog, ChangeEvent}
import graft.operators.Envelope
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The reference's full topology as ONE streaming query: a single
  * change-log stream carrying every table's events, routed per micro-batch
  * through the rule set into per-table MERGE targets.
  *
  * Reference shape: one binlog reader → rule lookup per event → per-table
  * request buffers → bulk apply (river/sync.go:72-167). Here: one file
  * source over the envelope log → [[Envelope.route]] (filter + cast +
  * rename compiled per rule) → [[CdcStream.mergeBatch]] per sink table,
  * all inside one `foreachBatch`, so the batch's offset range commits
  * atomically for every table — the reference's single position file
  * covering all tables (river/master.go) maps to the one checkpoint.
  *
  * Config mapping (reference etc/river.toml): `bulk_size` →
  * `maxFilesPerTrigger` (batch size cap), `flush_bulk_time` →
  * `Trigger.ProcessingTime`, `-update`/`-delete` ignore flags → dropped
  * ops, `skip_no_pk_table` → Catalog registration policy.
  *
  * Scale: the routed projections are narrow selects off the shared
  * batch — Spark computes the batch scan once (persisted per batch), and
  * each table's merge shuffles only its own events on its own keys.
  */
object CdcPipeline {

  /** Target directory for a rule's sink table. */
  def targetDir(root: String, sinkSchema: String, sinkTable: String): String =
    s"$root/$sinkSchema.$sinkTable"

  /** Expand wildcard-table rules against the live catalog — the
    * reference expands the table regex over information_schema at
    * prepare time (river/river.go:196-221) and picks up tables CREATED
    * later via updateRule (river/river.go:166-180). Every expanded rule
    * keeps the spec's sink, so sharded sources (`logs_.*`) converge into
    * ONE sink table — the wildcard pattern's documented purpose. Called
    * per micro-batch, so a table registered mid-stream syncs from the
    * next batch on, no restart. */
  private[streaming] def expandRules(rules: Seq[Rule],
      catalog: Catalog): Seq[Rule] =
    rules.flatMap { r =>
      if (!Rule.isRegexSpec(r.sourceTable)) Seq(r)
      else Rule.expand(r.sourceTable,
        catalog.tableNames(r.sourceSchema))
        .map(t => r.copy(sourceTable = t))
    }

  /** Source-side include filter — the reference pushes the ruled-table
    * regex into the binlog reader config (river/river.go:114-118,
    * IncludeTableRegex) so unruled tables never leave the source; here
    * the same predicate lands on the envelope-log SCAN (equality
    * disjunction for literal table specs → parquet `PushedFilters`;
    * anchored RLIKE for wildcard specs, which still prunes pre-shuffle).
    * Applied at stream start, like the reference's reader config: a rule
    * ADDED mid-stream only widens routing within this filter unless its
    * tables were already covered (e.g. by a wildcard spec).
    */
  private[streaming] def includeFilter(rules: Seq[Rule]): Column =
    rules.map { r =>
      val schemaMatch = col("schema") === r.sourceSchema
      if (Rule.isRegexSpec(r.sourceTable)) {
        schemaMatch &&
          col("table").rlike("^" + Rule.buildTable(r.sourceTable) + "$")
      } else schemaMatch && col("table") === r.sourceTable
    }.reduceOption(_ || _)
      // no rules = nothing routed anywhere: scan nothing, not everything
      .getOrElse(lit(false))

  def start(spark: SparkSession, changesDir: String, cfg: SyncConfig,
      catalog: Catalog, targetRoot: String, checkpointDir: String,
      trigger: Option[Trigger] = None): StreamingQuery =
    start(spark, changesDir, () => cfg, catalog, targetRoot, checkpointDir,
      trigger)

  def start(spark: SparkSession, changesDir: String,
      cfgProvider: () => SyncConfig, catalog: Catalog, targetRoot: String,
      checkpointDir: String,
      trigger: Option[Trigger]): StreamingQuery =
    start(spark, changesDir, cfgProvider, catalog, targetRoot,
      checkpointDir, trigger, stateBuckets = None)

  /** Live-config variant (ST6 in-flight evolution): `cfgProvider` is
    * re-read and [[Envelope.route]]'s projections are re-compiled at
    * EVERY micro-batch against the (mutable) `catalog`, so a DDL-style
    * refresh — `catalog.refresh` with an added/dropped column, or a new
    * rule from the provider — takes effect on the next batch without
    * stopping the stream. This is the reference's `OnTableChanged` →
    * re-fetch TableInfo → `updateRule` live path (river/sync.go:54-60,
    * river/river.go:166-180); in-flight batches keep the definitions
    * they started with.
    *
    * `stateBuckets = Some(n)` switches every sink to the
    * partition-scoped [[BucketedState]] layout (only the key-buckets a
    * batch touches are rewritten) — the at-100 TB state layout.
    */
  def start(spark: SparkSession, changesDir: String,
      cfgProvider: () => SyncConfig, catalog: Catalog, targetRoot: String,
      checkpointDir: String, trigger: Option[Trigger],
      stateBuckets: Option[Int]): StreamingQuery = {
    val cfg0 = cfgProvider()
    val t = trigger.getOrElse(
      if (cfg0.flushIntervalMs > 0)
        Trigger.ProcessingTime(cfg0.flushIntervalMs)
      else Trigger.AvailableNow())
    Observability.withEnvelopeMetrics(
      spark.readStream
        .schema(ChangeEvent.envelopeSchema)
        .option("maxFilesPerTrigger", math.max(1, cfg0.bulkSize / 128))
        .parquet(changesDir)
        .where(includeFilter(cfg0.rules)))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // re-resolve rules + TableDefs NOW, not at stream start: this
        // batch routes with the schema (and wildcard expansion) the
        // registry holds at this moment
        val cfg = cfgProvider()
        val rules = expandRules(cfg.rules, catalog)
        batch.persist()
        try {
          // per-sink merges are independent (disjoint targets); run
          // them as concurrent Spark jobs so one batch's wall time is
          // max(sink merge), not sum — the reference's `thread` pool
          // knob (etc/river.toml:15) without the shared-buffer locking.
          // Wildcard-expanded shards sharing a sink union into ONE
          // merge, so the per-key LWW collapse sees every shard's events
          import scala.concurrent.{Await, Future}
          import scala.concurrent.ExecutionContext.Implicits.global
          import scala.concurrent.duration.Duration
          val routed = Envelope.route(batch, rules, catalog)
          val merges = routed.toSeq
            .flatMap { case ((srcSchema, srcTable), typed) =>
              rules.find(r => r.sourceSchema == srcSchema &&
                r.sourceTable == srcTable).map(r => (r, typed))
            }
            .groupBy { case (r, _) => (r.sinkSchema, r.sinkTable) }
            .map { case ((sinkSchema, sinkTable), parts) =>
              Future {
                val (rule, _) = parts.head
                val defn = catalog
                  .get(rule.sourceSchema, rule.sourceTable).get
                // key columns carry their SINK names post-projection
                val sinkKeys = defn.pkColumns.map(rule.mappedField(_)._1)
                val typed = parts.map(_._2).reduce(_ unionByName _)
                // skip sinks this batch doesn't touch
                if (!typed.isEmpty) {
                  val dir = targetDir(targetRoot, sinkSchema, sinkTable)
                  stateBuckets match {
                    case Some(n) => BucketedState.mergeBatch(typed,
                      batchId, dir, sinkKeys, n,
                      cfg.ignoreUpdates, cfg.ignoreDeletes)
                    case None => CdcStream.mergeBatch(typed, batchId, dir,
                      sinkKeys, cfg.ignoreUpdates, cfg.ignoreDeletes)
                  }
                }
              }
            }
          Await.result(Future.sequence(merges), Duration.Inf)
          ()
        } finally batch.unpersist()
      }
      .trigger(t)
      .start()
  }

  /** Drain everything currently in the log and return each sink table's
    * live view (wildcard rules expanded; shards sharing a sink yield
    * one view). */
  def replayToCompletion(spark: SparkSession, changesDir: String,
      cfg: SyncConfig, catalog: Catalog, targetRoot: String,
      checkpointDir: String): Map[(String, String), DataFrame] = {
    val q = start(spark, changesDir, cfg, catalog, targetRoot,
      checkpointDir, trigger = Some(Trigger.AvailableNow()))
    q.awaitTermination()
    expandRules(cfg.rules, catalog).flatMap { r =>
      catalog.get(r.sourceSchema, r.sourceTable).map { defn =>
        val sample = Envelope.toTyped(
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            ChangeEvent.envelopeSchema), defn, r)
        (r.sinkSchema, r.sinkTable) -> CdcStream.currentView(spark,
          targetDir(targetRoot, r.sinkSchema, r.sinkTable), sample.schema)
      }
    }.toMap
  }
}
