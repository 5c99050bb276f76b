package graft
import org.apache.spark.sql.SparkSession

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

object Bench {

  /** 1-minute load average — the contention signal on this shared VM. */
  private def loadavg: Double =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.split("\\s+").head.toDouble finally src.close()
    } catch { case _: Throwable => -1.0 }

  /** A measurement ≥3× its floor AND ≥0.5 s over it is contamination
    * (the absolute guard keeps sub-second noise from tripping the ratio). */
  private val Ratio = 3.0
  private val AbsSlack = 0.5

  /** `BENCH_floor.json`: `{"sf0.1": {"query": secs, …}, …}` — best-known
    * clean per-query times, monotonically min'd across rounds. Min-of-3
    * with a min/median-divergence retry is blind to SUSTAINED host load
    * (min ≈ median when the whole run is slow), which shipped two garbage
    * official records in four rounds; comparing against a persisted
    * cross-round floor catches exactly that case and lets the record
    * flag itself instead of lying. */
  private def floorPath: java.nio.file.Path = {
    val local = Paths.get(sys.env.getOrElse("SPARK_GRAFT_FLOOR", "BENCH_floor.json"))
    if (Files.exists(local)) local else {
      val repo = Paths.get("/root/repo/BENCH_floor.json")
      if (Files.exists(repo)) repo else local
    }
  }

  /** `BENCH_floor_resets.json`: `{"query": "reset-id", …}` — checked into
    * the repo alongside a code change that moves a query's cost class
    * (e.g. stub → real image decode). A floor measured against the old
    * implementation is unreachable by the new one, so without a reset the
    * record brands itself contaminated forever and `queries_clean`
    * substitutes a number the shipped code can never hit. The floor file
    * tracks applied reset ids per sf under `"_applied"`; a pending reset
    * drops the stale floor at load time so the query reseeds like a brand
    * new one (and seeding still only happens from a clean run). */
  private def resetsPath: java.nio.file.Path = {
    val local = Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_FLOOR_RESETS", "BENCH_floor_resets.json"))
    if (Files.exists(local)) local else Paths.get("/root/repo/BENCH_floor_resets.json")
  }

  private def readResets(): Map[String, String] =
    try {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val txt = new String(Files.readAllBytes(resetsPath), StandardCharsets.UTF_8)
      JsonMethods.parse(txt) match {
        case JObject(qs) => qs.collect { case (q, JString(id)) => q -> id }.toMap
        case _ => Map.empty
      }
    } catch { case _: Throwable => Map.empty }

  /** (floors per sf, applied reset ids per sf). */
  private def readAllFloors()
      : (Map[String, Map[String, Double]], Map[String, Map[String, String]]) =
    try {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val txt = new String(Files.readAllBytes(floorPath), StandardCharsets.UTF_8)
      JsonMethods.parse(txt) match {
        case JObject(top) =>
          val floors = top.collect {
            case (sf, JObject(qs)) if sf != "_applied" =>
              sf -> qs.collect {
                case (q, JDouble(v))  => q -> v
                case (q, JInt(v))     => q -> v.toDouble
                case (q, JDecimal(v)) => q -> v.toDouble
              }.toMap
          }.toMap
          val applied = top.collectFirst { case ("_applied", JObject(sfs)) =>
            sfs.collect { case (sf, JObject(qs)) =>
              sf -> qs.collect { case (q, JString(id)) => q -> id }.toMap
            }.toMap
          }.getOrElse(Map.empty[String, Map[String, String]])
          (floors, applied)
        case _ => (Map.empty, Map.empty)
      }
    } catch { case _: Throwable => (Map.empty, Map.empty) }

  private def writeAllFloors(all: Map[String, Map[String, Double]],
      applied: Map[String, Map[String, String]]): Unit =
    try {
      val sfBodies = all.toSeq.sortBy(_._1).map { case (sf, qs) =>
        val inner = qs.toSeq.sortBy(_._1)
          .map { case (q, v) => s""" "$q": ${math.rint(v * 1e4) / 1e4}""" }
          .mkString(",\n")
        s""" "$sf": {\n$inner\n }"""
      }
      val appliedBody =
        if (applied.forall(_._2.isEmpty)) Seq.empty
        else Seq(applied.toSeq.sortBy(_._1).filter(_._2.nonEmpty).map {
          case (sf, qs) =>
            val inner = qs.toSeq.sortBy(_._1)
              .map { case (q, id) => s"""  "$q": "$id"""" }
              .mkString(",\n")
            s"""  "$sf": {\n$inner\n  }"""
        }.mkString(" \"_applied\": {\n", ",\n", "\n }"))
      val body = (sfBodies ++ appliedBody).mkString("{\n", ",\n", "\n}\n")
      Files.write(floorPath, body.getBytes(StandardCharsets.UTF_8))
    } catch { case _: Throwable => () } // floors are best-effort persistence

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    // warmup: pay JVM/codegen/page-cache startup outside the timings
    try SparkEntry.queries("q1_agg")(spark, sfDir).count()
    catch { case _: Throwable => () }
    // SPARK_GRAFT_ONLY=q1,q2 restricts the set (iteration aid)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").toSet)
    val loadBefore = loadavg

    val sfKey = new java.io.File(sfDir).getName
    val (allFloors, allApplied) = readAllFloors()
    val appliedSf = allApplied.getOrElse(sfKey, Map.empty)
    // Resets not yet applied at this sf: drop the stale floor so the
    // query is treated as new (reseeded only from a clean run). A "*"
    // entry invalidates every floor (a bench-wide change, e.g. the
    // measured action itself); it composes with per-query ids so the
    // two kinds of invalidation stay independent.
    val resets = readResets()
    def effectiveResetId(q: String): Option[String] = {
      val ids = Seq(resets.get(q), resets.get("*")).flatten
      if (ids.isEmpty) None else Some(ids.mkString("+"))
    }
    def resetPending(q: String): Boolean =
      effectiveResetId(q).exists(id => !appliedSf.get(q).contains(id))
    val floorsAll = allFloors.getOrElse(sfKey, Map.empty)
    val pendingKeys = floorsAll.keySet.filter(resetPending)
    val floors = floorsAll -- pendingKeys
    def overFloor(name: String, t: Double): Boolean =
      floors.get(name).exists(f => t >= Ratio * f && t - f >= AbsSlack)

    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Double = {
      val t0 = System.nanoTime()
      // Force FULL row materialization, not count(): under count() the
      // optimizer prunes every projected column (an Aggregate needs
      // none of them), so expression-heavy map-only queries measured as
      // bare scans while the correctness gate (Verify, which writes the
      // rows) paid the real cost. toRdd executes the optimized plan
      // with the query's own output schema — nothing above it to prune
      // for — and draining the iterator evaluates every column of every
      // row, with no sink I/O in the timing.
      val ok =
        try {
          fn(spark, sfDir).queryExecution.toRdd.foreachPartition { it =>
            while (it.hasNext) it.next()
          }
          true
        }
        catch { case _: Throwable => false }
      val d = (System.nanoTime() - t0) / 1e9
      // drop cache blocks/broadcasts a query left behind so later
      // queries aren't taxed by this one's working set
      spark.catalog.clearCache()
      // NaN sentinel on failure: a query that throws quickly would
      // otherwise record a tiny positive wall time, seed an
      // unreachably low floor, and permanently brand later honest
      // runs contaminated. Failed measurements are excluded from
      // floors, queries, and queries_clean; the record lists the
      // query under "failed" instead.
      if (ok) d else Double.NaN
    }

    // Canary: the cheapest floor-known query, re-timed after each
    // measurement. Its trace is load evidence independent of the query
    // under test — a slow canary on code-untouched trivial work can only
    // mean host contention. Returns the CURRENT ratio (1.0 = clean) so
    // the rescue loop can tell "host recovered" from "worst ever seen".
    val canary = floors.toSeq.sortBy(_._2).headOption.map(_._1)
      .filter(SparkEntry.queries.contains)
    var canaryWorst = 0.0
    def probeCanary(): Double = canary.map { c =>
      val t = timeOnce(SparkEntry.queries(c))
      // a NaN (failed) canary reports clean here; the failure itself
      // surfaces through the canary query's own "failed" entry
      val r = if (t.isNaN || t - floors(c) < AbsSlack) 1.0
              else t / math.max(floors(c), 1e-3)
      if (r > canaryWorst) canaryWorst = r
      r
    }.getOrElse(1.0)

    val measured = scala.collection.mutable.LinkedHashMap(
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter(q => only.forall(_.contains(q._1))).map {
        case (name, fn) =>
          // min of three runs: the shared-host VM shows bursty
          // multi-second steal stalls; the min is the least-interfered
          // measurement. Two contamination triggers re-measure (bounded):
          // min/median divergence ≥3× (bursty load) and min ≥3× the
          // persisted floor (sustained load — invisible to
          // self-consistency checks).
          var ts = (0 until 3).map(_ => timeOnce(fn))
            .filterNot(_.isNaN).sorted
          var retries = 0
          def suspect = ts.isEmpty ||
            (ts.size >= 2 && ts(1) / math.max(ts.head, 1e-9) >= Ratio) ||
            overFloor(name, ts.head)
          while (suspect && retries < 4) {
            val t = timeOnce(fn)
            if (!t.isNaN) ts = (ts :+ t).sorted.take(3)
            retries += 1
          }
          probeCanary()
          name -> (if (ts.isEmpty) Double.NaN else ts.head)
      }: _*)

    // Rescue passes: host contamination is transient, so instead of
    // shipping a self-flagged record, sleep and re-measure ONLY the
    // flagged queries (bounded: 3 passes, 20/40/60 s back-off — ≤2 min
    // of sleeping total). If the host recovers mid-run, the official
    // record comes out clean; if it never does, the flag stands and
    // queries_clean below still carries defensible numbers.
    def flaggedNow: List[String] =
      measured.collect { case (n, t) if overFloor(n, t) => n }.toList
    var canaryNow = if (canaryWorst >= Ratio) canaryWorst else 1.0
    var rescues = 0
    while ((flaggedNow.nonEmpty || canaryNow >= Ratio) && rescues < 3) {
      rescues += 1
      Thread.sleep(20000L * rescues)
      flaggedNow.foreach { n =>
        // guard the rescue sample: math.min NaN-propagates, so a query
        // that throws during the re-time must not overwrite its valid
        // main-pass measurement
        val t = timeOnce(SparkEntry.queries(n))
        if (!t.isNaN) measured(n) = math.min(measured(n), t)
      }
      canaryNow = probeCanary()
    }
    val loadAfter = loadavg

    // Self-describing record: queries still ≥3× their floor after the
    // retry + rescue budget are listed with their ratios, and the record
    // carries an explicit contaminated flag — a reader never has to
    // guess whether a blowup is code or host load.
    val results = measured.toSeq
    val deltas = results.collect {
      case (name, t) if overFloor(name, t) =>
        name -> math.rint(t / floors(name) * 100) / 100
    }
    val contaminated = deltas.nonEmpty || canaryNow >= Ratio

    // Monotone floor update: existing floors only ever decrease; new
    // queries are seeded only from a run whose record is clean AND
    // whose host was measurably quiet. The second condition matters
    // on a full-reset run ("*"): with every floor dropped, the canary
    // and overFloor detectors are vacuous, so "clean" alone would let
    // sustained host load seed poisoned floors — loadavg is the one
    // contention signal independent of the floors themselves.
    // (Monotone decreases stay ungated: load only ever inflates a
    // measurement, so a lower observation is always a real floor.)
    val quietLoadMax = sys.env.get("SPARK_GRAFT_QUIET_LOAD")
      .map(_.toDouble).getOrElse(8.0)
    val quietHost = loadBefore >= 0 && loadBefore <= quietLoadMax
    val updated = floors ++ results.collect {
      case (name, t) if t > 0 &&
          (floors.get(name).exists(t < _) ||
            (!floors.contains(name) && !contaminated && quietHost)) =>
        name -> t
    }
    // A pending reset is marked applied once its query reseeds; until
    // then the stale floor keeps being dropped at load on every run.
    val newApplied = appliedSf ++ results.collect {
      case (q, _) if updated.contains(q) && resetPending(q) =>
        q -> effectiveResetId(q).get
    }
    if (updated != allFloors.getOrElse(sfKey, Map.empty) || newApplied != appliedSf)
      writeAllFloors(allFloors + (sfKey -> updated),
        allApplied + (sfKey -> newApplied))

    // queries_clean: per-query min(measured, best-known floor) — the
    // defensible number either way. On a quiet host it equals the
    // measurement; under load it is the cross-round floor the code has
    // demonstrably hit before. value_clean = its sum. Failed (NaN)
    // queries are excluded from both maps and listed under "failed".
    val okResults = results.filterNot(_._2.isNaN)
    val failed = results.collect { case (n, t) if t.isNaN => n }
    val clean = okResults.map { case (n, t) =>
      n -> floors.get(n).fold(t)(f => math.min(t, f))
    }

    val qs = okResults.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val cs = clean.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val ds = deltas.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = okResults.map(_._2).sum
    val totalClean = clean.map(_._2).sum
    // applied = resets whose floors actually reseeded THIS run;
    // pending = resets still waiting on a clean quiet-host run. The
    // old single field reported pending keys under the name
    // "..._applied", so a contaminated run read as a completed reset.
    val appliedNow = newApplied.collect {
      case (q, id) if !appliedSf.get(q).contains(id) => q
    }.toSeq.sorted
    def jList(xs: Seq[String]): String =
      xs.map(q => "\"" + q + "\"").mkString("[", ",", "]")
    val record = s"""{"metric":"total","value":$total,"unit":"sec","value_clean":$totalClean,"queries":$qs,"queries_clean":$cs,"sf":"$sfDir","contaminated":$contaminated,"rescue_passes":$rescues,"floor_deltas":$ds,"failed":${jList(failed)},"floor_resets_applied":${jList(appliedNow)},"floor_resets_pending":${jList((pendingKeys -- appliedNow).toSeq.sorted)},"quiet_host":$quietHost,"canary_worst_ratio":${math.rint(canaryWorst * 100) / 100},"loadavg_before":$loadBefore,"loadavg_after":$loadAfter}"""
    // Full artifact on disk FIRST — the source of truth: the driver's
    // stdout capture head-truncates long records (BENCH_r07's copy
    // lost its header) and stray late log lines corrupt the tail
    // (BENCH_r11's parsed: null), so the round's complete per-query
    // record must never depend on stdout cleanliness. A write failure
    // is flagged loudly (stderr doesn't contaminate the parsed stdout
    // record) instead of swallowed: a round must not report success on
    // stdout with the authoritative artifact silently missing or stale.
    // Two copies: the legacy fixed name (existing readers) AND a
    // cpus-suffixed name. A round's scaling probe re-runs the bench at a
    // lower core count, and with only the fixed name the second run
    // clobbered the first run's per-query map — r15's PERF record lost
    // its whole per_query/scaling table to exactly that. The suffixed
    // file gives every core count its own durable record.
    val recordDir = floorPath.toAbsolutePath.getParent
    val recordFile = recordDir.resolve("BENCH_local.json")
    val recordFileCpus = recordDir.resolve(s"BENCH_local_${cpus}c.json")
    val recordWritten =
      try {
        Files.write(recordFile,
          (record + "\n").getBytes(StandardCharsets.UTF_8))
        Files.write(recordFileCpus,
          (record + "\n").getBytes(StandardCharsets.UTF_8))
        true
      } catch {
        case t: Throwable =>
          System.err.println(
            s"WARNING: failed to write $recordFile / $recordFileCpus: $t " +
              "— the full per-query record is LOST for this run; only " +
              "the compact stdout totals survive")
          false
      }
    // The stdout line is a COMPACT record: the driver keeps only the
    // last ~2000 chars of stdout, and the full per-query record line
    // (~4 KB at 170 queries) overflows that window — BENCH_r11/r12
    // both came back `parsed: null` with a perfectly clean exit. The
    // compact line carries the headline totals, the contamination
    // flags, the slowest queries, and a pointer to the on-disk record;
    // the full per-query maps live only in BENCH_local.json.
    def jCap(xs: Seq[String]): String = jList(xs.take(20))
    val slowest = clean.sortBy(-_._2).take(15)
      .map { case (k, v) => "\"" + k + "\":" + math.rint(v * 1e4) / 1e4 }
      .mkString("{", ",", "}")
    // floor_deltas capped like the other lists: a heavily contaminated
    // run (many queries over floor) must not push the compact line past
    // the driver's ~2000-char stdout tail — the worst 15 ratios ride
    // here with the total count; the full map is in BENCH_local.json
    val dsCompact = deltas.sortBy(-_._2).take(15)
      .map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // JSON string escape for interpolated paths (backslash/quote-safe)
    def jStr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val compact = s"""{"metric":"total","value":$total,"unit":"sec","value_clean":$totalClean,"n_queries":${okResults.size},"sf":"$sfDir","contaminated":$contaminated,"rescue_passes":$rescues,"failed_count":${failed.size},"failed":${jCap(failed)},"floor_deltas":$dsCompact,"floor_delta_count":${deltas.size},"floor_resets_applied":${jCap(appliedNow)},"floor_resets_pending":${jCap((pendingKeys -- appliedNow).toSeq.sorted)},"quiet_host":$quietHost,"canary_worst_ratio":${math.rint(canaryWorst * 100) / 100},"loadavg_before":$loadBefore,"loadavg_after":$loadAfter,"slowest_clean":$slowest,"record_written":$recordWritten,"record_file":${jStr(recordFile.toString)},"record_file_cpus":${jStr(recordFileCpus.toString)}}"""
    // stdout line for the driver/humans LAST, then immediate exit: no
    // thread gets a timeslice to log behind the record
    QuietExit.emitAndExit(spark, Some(compact))
  }
}
