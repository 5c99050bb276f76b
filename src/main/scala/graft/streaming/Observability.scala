package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import graft.model.ChangeEvent
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** S11: the reference's `/stat` endpoint — synced-position vs master
  * position plus running I/U/D counters (reference: river/status.go:24-68,
  * counters bumped at river/sync.go:202-234). On Spark the same numbers
  * come from `observe` metrics (computed inside the query plan, no extra
  * pass) surfaced through a StreamingQueryListener; positions are the
  * streaming progress's offsets.
  */
object Observability {
  import ChangeEvent.{OpCol, OpDelete, OpInsert, OpUpdate}

  val MetricsName = "graft_cdc"

  /** Master vs synced position of a file-tailed change log — the
    * reference /stat's whole point for an operator: how far behind the
    * source the sync is (river/status.go:27-46 runs a live `SHOW
    * MASTER STATUS` and prints it next to the synced position). For a
    * file source the master position is the count of data files
    * PRESENT in the watched directory and the synced position is the
    * count of files inside batches the checkpoint's commit log has
    * sealed. */
  final case class SyncLag(masterFiles: Long, syncedFiles: Long) {
    /** Files the source has that the sync hasn't committed yet. */
    def lag: Long = masterFiles - syncedFiles
  }

  /** Probe [[SyncLag]] for a file-source stream: lists `changesDir`
    * (data files only — the same dot/underscore hidden-file rule the
    * source applies) against the checkpoint's committed file-source
    * metadata log. Driver-side metadata listing only — never reads
    * data; safe to call from a /stat handler while the stream runs.
    * `sourceId` is the source's position in the query (0 for the
    * single-source CDC streams). */
  def fileSourceLag(spark: org.apache.spark.sql.SparkSession,
      changesDir: String, checkpointDir: String,
      sourceId: Int = 0): SyncLag = {
    val conf = spark.sparkContext.hadoopConfiguration
    def isData(name: String) =
      !name.startsWith(".") && !name.startsWith("_")
    val cPath = new org.apache.hadoop.fs.Path(changesDir)
    val cfs = cPath.getFileSystem(conf)
    val master =
      if (!cfs.exists(cPath)) 0L
      else cfs.listStatus(cPath)
        .count(s => s.isFile && isData(s.getPath.getName)).toLong

    val commits = new org.apache.hadoop.fs.Path(s"$checkpointDir/commits")
    val kfs = commits.getFileSystem(conf)
    val committed: Option[Long] =
      if (!kfs.exists(commits)) None
      else kfs.listStatus(commits).toSeq.map(_.getPath.getName)
        .filter(n => n.nonEmpty && n.forall(_.isDigit))
        .map(_.toLong).maxOption
    val synced = committed.fold(0L) { b =>
      val srcDir =
        new org.apache.hadoop.fs.Path(s"$checkpointDir/sources/$sourceId")
      if (!kfs.exists(srcDir)) 0L
      else {
        val names = kfs.listStatus(srcDir).toSeq.map(_.getPath.getName)
        // the source metadata log compacts periodically: <n>.compact
        // holds the FULL history through n — count it once, then only
        // the plain per-batch files after it
        def entriesOf(name: String): Long = {
          val in = kfs.open(new org.apache.hadoop.fs.Path(srcDir, name))
          try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
            .drop(1).count(_.contains("\"path\"")).toLong
          finally in.close()
        }
        // entries at or below the committed batch — v1 log entries
        // carry their batchId, so a compact BEYOND the commit horizon
        // can still be filtered down to the committed prefix
        def entriesUpTo(name: String, upTo: Long): Long = {
          val BatchId = "\"batchId\"\\s*:\\s*(-?\\d+)".r
          val in = kfs.open(new org.apache.hadoop.fs.Path(srcDir, name))
          try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
            .drop(1).filter(_.contains("\"path\""))
            .count(l => BatchId.findFirstMatchIn(l)
              .forall(_.group(1).toLong <= upTo)).toLong
          finally in.close()
        }
        val plain = names
          .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong)
        val compacts = names.filter(_.endsWith(".compact"))
          .map(_.stripSuffix(".compact"))
          .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong)
        compacts.filter(_ <= b).maxOption match {
          case Some(base) =>
            entriesOf(s"$base.compact") +
              plain.filter(n => n > base && n <= b)
                .map(n => entriesOf(n.toString)).sum
          case None =>
            val present = plain.filter(_ <= b).toSet
            if ((0L to b).forall(present.contains))
              present.toSeq.map(n => entriesOf(n.toString)).sum
            else
              // per-batch history purged past a NEWER compact (ADVICE
              // r9): the compact's entries, filtered to the committed
              // batches, are the only complete record — without this
              // the sum undercounts and /stat inflates the lag
              compacts.filter(_ > b).minOption match {
                case Some(c) => entriesUpTo(s"$c.compact", b)
                case None => // truly partial history: best-effort
                  present.toSeq.map(n => entriesOf(n.toString)).sum
              }
        }
      }
    }
    SyncLag(master, synced)
  }

  /** Attach I/U/D counters to a change DataFrame; zero extra passes —
    * the counts piggyback on whatever action consumes the frame. */
  def withOpMetrics(changes: DataFrame): DataFrame =
    changes.observe(MetricsName,
      count(when(col(OpCol) === OpInsert, 1)).as("inserts"),
      count(when(col(OpCol) === OpUpdate, 1)).as("updates"),
      count(when(col(OpCol) === OpDelete, 1)).as("deletes"),
      count(lit(1)).as("events"))

  /** Same counters for the generic envelope stream (whose op column is
    * the envelope's own `op`, not the typed `_op`). */
  def withEnvelopeMetrics(events: DataFrame): DataFrame =
    events.observe(MetricsName,
      count(when(col("op") === OpInsert, 1)).as("inserts"),
      count(when(col("op") === OpUpdate, 1)).as("updates"),
      count(when(col("op") === OpDelete, 1)).as("deletes"),
      count(lit(1)).as("events"))

  /** Accumulates observed I/U/D totals across micro-batches and exposes
    * the latest progress — the data behind a /stat endpoint. */
  final class CdcMetricsListener extends StreamingQueryListener {
    val inserts = new AtomicLong
    val updates = new AtomicLong
    val deletes = new AtomicLong
    val events = new AtomicLong
    @volatile var lastProgressJson: String = ""
    /** The terminating exception of the last failed query — carries the
      * PK guard's table=… null_cols=… payload (ST4 fail-stop
      * attribution). */
    @volatile var lastError: Option[String] = None

    /** Optional master-vs-synced probe ([[fileSourceLag]] curried over
      * the stream's dirs); evaluated per /stat render so the lag is
      * live. */
    @volatile var lagProbe: Option[() => SyncLag] = None

    /** Wire the master-vs-synced lag lines into [[statReport]] for a
      * file-source stream. */
    def attachFileLag(spark: org.apache.spark.sql.SparkSession,
        changesDir: String, checkpointDir: String): this.type = {
      lagProbe = Some(() => fileSourceLag(spark, changesDir, checkpointDir))
      this
    }

    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()

    /** Latest end offset per source — the engine's "synced binlog
      * position" (reference /stat prints file+pos,
      * river/status.go:39-46; here the offset is the file-source's
      * committed log position). */
    @volatile var lastPosition: String = ""

    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      lastProgressJson = e.progress.json
      lastPosition = e.progress.sources.toSeq
        .map(s => Option(s.endOffset).getOrElse(""))
        .mkString(";").replace("\n", " ")
      val metrics = e.progress.observedMetrics
      if (metrics.containsKey(MetricsName)) {
        val row = metrics.get(MetricsName)
        inserts.addAndGet(row.getAs[Long]("inserts"))
        updates.addAndGet(row.getAs[Long]("updates"))
        deletes.addAndGet(row.getAs[Long]("deletes"))
        events.addAndGet(row.getAs[Long]("events"))
      }
    }

    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit =
      e.exception.foreach(err => lastError = Some(err))

    /** The reference's plaintext /stat body shape
      * (river/status.go:39-46), plus a last_error line when a query
      * died (one line — the exception's head). */
    def statReport: String = {
      val base =
        s"""insert_num: ${inserts.get}
           |update_num: ${updates.get}
           |delete_num: ${deletes.get}
           |events: ${events.get}""".stripMargin
      val withPos =
        if (lastPosition.isEmpty) base
        else base + "\nposition: " + lastPosition
      // master-vs-synced lag (reference prints the SHOW-MASTER-STATUS
      // position next to the synced one); probe failures degrade to
      // omitting the lines, never to a dead /stat
      val withLag = lagProbe
        .flatMap(p => scala.util.Try(p()).toOption)
        .fold(withPos) { l =>
          withPos + s"\nmaster_position: ${l.masterFiles}" +
            s"\nsynced_position: ${l.syncedFiles}" +
            s"\nlag: ${l.lag}"
        }
      lastError.fold(withLag) { err =>
        withLag + "\nlast_error: " +
          err.linesIterator.find(_.nonEmpty).getOrElse("")
      }
    }
  }

  /** The reference's status HTTP server (river/status.go:24-68, wired at
    * river/river.go:186-189): plaintext counters at `/stat`, plus the
    * last streaming progress JSON at `/progress` — Spark's progress
    * (sources' start/end offsets) is the engine's `read_binlog` position
    * line. JDK built-in `com.sun.net.httpserver`, no dependency; bind
    * port 0 to let the OS pick (reference skips serving when `stat_addr`
    * is empty — pass [[start]] no listener instead).
    */
  final class StatServer private (
      server: com.sun.net.httpserver.HttpServer) extends AutoCloseable {
    def boundPort: Int = server.getAddress.getPort
    override def close(): Unit = server.stop(0)
  }

  object StatServer {
    private def handler(body: () => String)
        : com.sun.net.httpserver.HttpHandler =
      (ex: com.sun.net.httpserver.HttpExchange) => {
        val bytes = body().getBytes("UTF-8")
        ex.getResponseHeaders.set("Content-Type", "text/plain; charset=utf-8")
        ex.sendResponseHeaders(200, bytes.length.toLong)
        val os = ex.getResponseBody
        try os.write(bytes) finally os.close()
      }

    def start(listener: CdcMetricsListener, port: Int = 0): StatServer = {
      val server = com.sun.net.httpserver.HttpServer.create(
        new java.net.InetSocketAddress(port), 0)
      server.createContext("/stat", handler(() => listener.statReport + "\n"))
      server.createContext("/progress",
        handler(() => listener.lastProgressJson))
      server.setExecutor(null) // serve on the dispatch thread; /stat is tiny
      server.start()
      new StatServer(server)
    }
  }
}
