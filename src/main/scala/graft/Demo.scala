package graft

import java.nio.file.Files

import graft.config.TomlConfig
import graft.model.{Catalog, TableDef}
import graft.operators.ChangeFeed
import graft.streaming.{CdcPipeline, CdcStream, Observability}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end usage demo — the migration path for a reference user:
  * their river.toml becomes a SyncConfig, their MySQL schemas a Catalog,
  * their mysqldump a bootstrap, their binlog a change-log stream, their
  * ClickHouse tables the versioned merge targets. Run with
  * `tools/run.sh graft.Demo`.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = Files.createTempDirectory("graft_demo_").toString
    val sf = "/root/testdata/sf0.001"

    // 1. the reference's config file, verbatim shape
    val cfg = TomlConfig.parse(
      """bulk_size = 128
        |flush_bulk_time = "0ms"  # AvailableNow for the demo
        |skip_update = false      # reference defaults to insert-only;
        |skip_delete = false      # the demo shows the full merge path
        |
        |[[rule]]
        |source_schema = "tpch"
        |source_table = "orders"
        |sink_schema = "sink"
        |sink_table = "orders"
        |id = ["o_orderkey"]
        |""".stripMargin)

    // 2. schema registry (the reference fetches this live from MySQL)
    val catalog = new Catalog()
    catalog.register("tpch", "orders",
      TableDef(ChangeFeed.orders(spark, sf).schema, Seq("o_orderkey")))

    // 3. change log: the I/U/D feed in binlog-envelope form
    ChangeFeed.fullEnvelope(spark, sf).repartition(2)
      .write.parquet(s"$work/changes")

    // 4. run the pipeline with observability
    val listener = new Observability.CdcMetricsListener
    spark.streams.addListener(listener)
    val views = CdcPipeline.replayToCompletion(spark, s"$work/changes",
      cfg, catalog, s"$work/targets", s"$work/ckpt")

    val orders = views(("sink", "orders"))
    println(s"[demo] synced orders rows: ${orders.count()}")
    println(s"[demo] top row: " +
      orders.orderBy(col("o_orderkey")).limit(1).collect().head)
    println("[demo] " + listener.statReport.replace("\n", " | "))

    // 5. the reference's /stat endpoint, served over HTTP
    val stat = Observability.StatServer.start(listener)
    val statUrl = s"http://127.0.0.1:${stat.boundPort}/stat"
    val in = java.net.URI.create(statUrl).toURL.openStream()
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    println(s"[demo] GET /stat -> " + body.replace("\n", " | "))
    stat.close()

    // 6. a Debezium JSON feed drops into the same pipeline: adapter ->
    // envelope -> route -> merge (the live-binlog migration path)
    val dbz = Seq(
      """{"before": null, "after": {"id": 1, "name": "ann"},
        | "source": {"db": "inv", "table": "cust",
        |   "file": "mysql-bin.000001", "pos": 10, "ts_ms": 1},
        | "op": "r", "ts_ms": 1}""".stripMargin.replaceAll("\n", ""),
      """{"before": {"id": 1, "name": "ann"},
        | "after": {"id": 1, "name": "ann2"},
        | "source": {"db": "inv", "table": "cust",
        |   "file": "mysql-bin.000001", "pos": 20, "ts_ms": 2},
        | "op": "u", "ts_ms": 2}""".stripMargin.replaceAll("\n", ""))
    import spark.implicits._
    val cat2 = new Catalog()
    cat2.register("inv", "cust", TableDef(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("name",
          org.apache.spark.sql.types.StringType))), Seq("id")))
    val typed = graft.operators.Envelope.route(
      graft.sources.DebeziumSource.fromJson(dbz.toDF("value")),
      Seq(graft.config.Rule("inv", "cust", "sink", "cust")), cat2)(
      ("inv", "cust"))
    val lww = graft.operators.CdcMerge.lastWriteWins(typed, Seq("id"))
    println(s"[demo] debezium feed -> LWW: " +
      lww.collect().mkString(", "))

    // 7. the same stream with a REAL database endpoint: per-batch merge
    // + LWW view pushed to an embedded Derby table (the ClickHouse
    // analog; swap the URL for any JDBC target)
    System.setProperty("derby.system.home", work)
    val url = s"jdbc:derby:$work/demodb;create=true"
    val derbyOpt = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val feed = ChangeFeed.full(spark, sf)
    feed.write.parquet(s"$work/changes2")
    CdcStream.startToJdbc(spark, s"$work/changes2", feed.schema,
      s"$work/target2", s"$work/ckpt2", ChangeFeed.keyCols,
      url, "orders_live", jdbcOptions = derbyOpt).awaitTermination()
    val live = graft.sources.SnapshotSource.jdbc(spark, url,
      "orders_live", options = derbyOpt)
    println(s"[demo] JDBC sink table rows: ${live.count()}")

    // 8. continuous corpus dedup: documents stream into the signature
    // store per micro-batch; pairs accumulate incrementally
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.repartition(3).write.parquet(s"$work/docs_in")
    val q = graft.operators.IncrementalDedup.stream(
      spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$work/docs_in"),
      "doc_id", "text", s"$work/dedup_store")
      .option("checkpointLocation", s"$work/ckpt3")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    println(s"[demo] incremental near-dup pairs: " +
      graft.operators.IncrementalDedup
        .allPairs(spark, s"$work/dedup_store").count())

    spark.streams.removeListener(listener)
    spark.stop()
  }
}
