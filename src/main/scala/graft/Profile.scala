package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-job profiler: `tools/run.sh graft.Profile <sfDir> <query> [runs]`
  * runs a named query with a listener that records every Spark job's
  * wall time, description, and stage breakdown — the measurement loop
  * behind the per-batch-constant work (guide §1: find where the time
  * goes before touching anything). Timing methodology matches Bench
  * (toRdd drain, clearCache between runs).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    require(args.length >= 2,
      "usage: Profile <sfDir> <query>[,query...] [runs]")
    val names = args(1).split(",").toSeq
    val runs = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // SPARK_GRAFT_EXTRA_CONF="k=v;k=v" — ad-hoc experiment knobs
    val spark = sys.env.get("SPARK_GRAFT_EXTRA_CONF")
      .map(_.split(";").filter(_.contains("=")).foldLeft(b0) { (b, kv) =>
        val Array(k, v) = kv.split("=", 2); b.config(k, v)
      }).getOrElse(b0)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)

    final case class Job(id: Int, desc: String, start: Long,
        var end: Long = 0L, var stages: Int = 0, var tasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val order = new java.util.concurrent.CopyOnWriteArrayList[Int]()
    val stageRows = new java.util.concurrent.CopyOnWriteArrayList[
      (Int, String, Int, Double, Double)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse(
            e.stageInfos.map(si => si.name.takeWhile(_ != '(').trim)
              .distinct.mkString("|"))
        jobs.put(e.jobId,
          Job(e.jobId, d, System.nanoTime(),
            stages = e.stageInfos.size,
            tasks = e.stageInfos.map(_.numTasks).sum))
        order.add(e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId)
        if (j != null) j.end = System.nanoTime()
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = (for (a <- si.completionTime; b <- si.submissionTime)
          yield (a - b) / 1e3).getOrElse(0.0)
        val cpu = si.taskMetrics.executorRunTime / 1e3
        // first repo frame in the callsite stack — the real attribution
        val frame = si.details.linesIterator
          .find(l => l.contains("graft.") && !l.contains("graft.Profile"))
          .map(_.trim.stripPrefix("at ").takeWhile(_ != ')') + ")")
          .getOrElse(si.name.takeWhile(_ != '(').trim)
        // physical-operator scopes of the stage's RDDs (innermost first)
        val scopes = si.rddInfos
          .flatMap(_.scope.map(_.name)).distinct.mkString(">")
        stageRows.add((si.stageId, s"$frame [$scopes]", si.numTasks,
          wall, cpu))
      }
    })

    // warmup like Bench
    try SparkEntry.queries("q1_agg")(spark, sfDir).count()
    catch { case _: Throwable => () }
    spark.catalog.clearCache()

    for (name <- names; r <- 1 to runs) {
      jobs.clear(); order.clear(); stageRows.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.toRdd.foreachPartition { it =>
          while (it.hasNext) it.next() }
      val total = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"%n==== $name run $r: total $total%.3f s, ${order.size} jobs ====")
      import scala.jdk.CollectionConverters._
      val js = order.asScala.toSeq.flatMap(id => Option(jobs.get(id)))
      val sumJobs = js.map(j => (j.end - j.start) / 1e9).sum
      println(f"sum of job walls: $sumJobs%.3f s (gaps = driver/planning/FS: ${total - sumJobs}%.3f s)")
      if (sys.env.get("SPARK_GRAFT_PROFILE_DETAIL").contains("1")) {
        js.foreach { j =>
          val d = (j.end - j.start) / 1e9
          if (d >= 0.005)
            println(f"  job ${j.id}%4d  $d%8.3f s  st=${j.stages}%2d tk=${j.tasks}%4d  ${j.desc.take(100)}")
        }
        println("---- by description ----")
        js.groupBy(_.desc).toSeq
          .map { case (d, g) =>
            (d, g.size, g.map(j => (j.end - j.start) / 1e9).sum) }
          .sortBy(-_._3)
          .foreach { case (d, n, t) =>
            println(f"  $t%8.3f s  n=$n%3d  ${d.take(100)}") }
        println("---- top stages (wall / task-cpu) ----")
        stageRows.asScala.toSeq.sortBy(-_._4).take(25)
          .foreach { case (id, nm, tk, w, c) =>
            println(f"  stage $id%4d  wall $w%7.3f  cpu $c%7.3f  tk=$tk%4d  ${nm.take(160)}") }
      }
    }
    QuietExit.emitAndExit(spark, None)
  }
}
