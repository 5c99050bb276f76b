package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.operators.{AsofJoin, Clustering, Dedup, Packing, RangeJoin}
import graft.functions.TextFunctions

/** Scale-claim validation — every operator in this engine carries a
  * "100 TB shape" argument (bounded equi-joins, O(log n) rounds, no
  * global window); this main MEASURES those claims instead of asserting
  * them. It blows the sf0.1 tables up ×N with structure-preserving
  * transforms, runs the five scale-argued operators at ×1 and ×N, and
  * records both wall time and load-independent STRUCTURAL evidence:
  *
  *   - `dedup_clusters`: connected-components round count must stay
  *     O(log n) — the blow-up replicates the duplicate graph N times
  *     (disjoint ids, per-copy alphabet rotation kills cross-copy
  *     shingle collisions), so rounds must NOT grow with N;
  *   - `range_join`: the candidate count (rows sharing a (key, bucket)
  *     cell — what the equi-join actually materializes) must grow ~N,
  *     not N² — the proof the bucketed rewrite never degenerates into
  *     the cross product Spark would plan for the raw predicate;
  *   - `asof_join` / `asof_join_bucketed` / `pack_budget` /
  *     `streaming_dedup`: output rows grow exactly ×N and wall time
  *     stays sub-superlinear.
  *
  * Wall times on this shared VM are noisy (see Bench's floor machinery),
  * so the verdict leans on the structural counters first and flags an
  * operator `superlinear` only when the fitted exponent
  * ln(tN/t1)/ln(N) exceeds [[ExponentSlack]] AND the scaled time is big
  * enough (> [[MinScaledSecs]]) that the ratio isn't fixed-overhead
  * noise. Fixed per-job overhead makes small inputs look BETTER than
  * linear at ×N — an exponent near or below 1 is the expected pass.
  *
  * Opt-in: `SPARK_GRAFT_SCALE_BASE` (default /root/testdata/sf0.1),
  * `SPARK_GRAFT_SCALE` (default 10). Emits one JSON line and writes
  * `BENCH_scale.json`.
  */
object BenchScale {

  private val ExponentSlack = 1.25
  private val MinScaledSecs = 2.0

  private val Alphabet = "abcdefghijklmnopqrstuvwxyz"

  /** ×N documents: copy i offsets doc_id into a disjoint id range and
    * rotates the lowercase alphabet by i — a char bijection, so the
    * duplicate structure WITHIN a copy is preserved exactly (equal
    * texts stay equal, shingle-set relations are isomorphic) while
    * cross-copy shingle/fingerprint collisions vanish. Result: the
    * duplicate graph of the base corpus, replicated N times over
    * disjoint nodes — edges ∝ N, components ∝ N, max component size
    * CONSTANT, which is precisely the "independent data grows
    * linearly" regime the operators claim to scale in. */
  def blowUpDocuments(docs: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"scale n=$n must be >= 1")
    (0 until n).map { i =>
      val rot = Alphabet.drop(i % 26) + Alphabet.take(i % 26)
      docs.select(
        (col("doc_id") + lit(i.toLong * 100000000L)).as("doc_id"),
        (if (i == 0) col("text")
         else translate(col("text"), Alphabet, rot)).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
  }

  /** ×N events: copy i offsets event_id and user_id into disjoint
    * ranges, timestamps unchanged — per-key row density stays constant
    * (the keys are new), so join fan-out per key is flat and any
    * super-linear time is the operator's fault, not the data's. */
  def blowUpEvents(ev: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"scale n=$n must be >= 1")
    (0 until n).map { i =>
      ev.select(
        (col("event_id") + lit(i.toLong * 10000000000L)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(i.toLong * 100000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _)
  }

  /** Candidate-pair count of the bucketed interval join — the number of
    * rows the (key, bucket) equi-join materializes BEFORE the exact
    * predicate filters them. Computed from per-cell counts (sum of
    * l·r over cells), so it is exact and costs two tiny aggregations
    * instead of re-running the join. Linear growth of this number under
    * ×N data is the operator's core scale claim. */
  def intervalCandidates(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], leftTs: String, rightTs: String,
      lower: Long, upper: Long): Long = {
    val width = upper - lower
    def fdiv(c: org.apache.spark.sql.Column) =
      call_function("div", c - pmod(c, lit(width)), lit(width))
    val keys = keyCols.map(col)
    val lc = left
      .withColumn("_bucket", explode(array_distinct(array(
        fdiv(col(leftTs) + lit(lower + 1L)), fdiv(col(leftTs) + lit(upper))))))
      .groupBy(keys :+ col("_bucket"): _*).agg(count(lit(1)).as("lc"))
    val rc = right.withColumn("_bucket", fdiv(col(rightTs)))
      .groupBy(keys :+ col("_bucket"): _*).agg(count(lit(1)).as("rc"))
    lc.join(rc, keyCols :+ "_bucket")
      .agg(coalesce(sum(col("lc") * col("rc")), lit(0L)))
      .head().getLong(0)
  }

  // ------------------------------------------------------------ operators

  private def clicksAndPurchases(s: SparkSession, evDir: String)
      : (DataFrame, DataFrame) = {
    val ev = s.read.parquet(evDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    (ev.filter(col("event_type") === "click")
       .select("event_id", "user_id", "ts"),
     ev.filter(col("event_type") === "purchase")
       .select(col("user_id"), col("ts"),
         col("event_id").as("pid"), col("value")))
  }

  /** One measured run: `action` is timed (returns the row count that
    * forces execution); `evidence` runs OUTSIDE the timer. */
  private final case class OpResult(secs: Double, evidence: Map[String, Long])

  private def timed(action: => Long)(extra: => Map[String, Long])
      : OpResult = {
    val t0 = System.nanoTime()
    val rows = action
    val secs = (System.nanoTime() - t0) / 1e9
    OpResult(secs, Map("out_rows" -> rows) ++ extra)
  }

  private def runDedupClusters(s: SparkSession, docsDir: String): OpResult = {
    val docs = s.read.parquet(docsDir)
    def pairs = Dedup.minhashDedupPairs(docs, "doc_id", "text",
        n = 3, k = 16, bands = 4, threshold = 0.8).select("a", "b")
      .unionByName(Dedup.simhashPairsBlocked(docs, "doc_id", "text",
        maxDist = 3).select("a", "b"))
    val r = timed {
      Clustering.canonicalize(docs.select("doc_id"), pairs, "doc_id").count()
    }(Map("cc_rounds" -> Clustering.lastStats.rounds.toLong))
    // pair counts are evidence, not cost: recomputed untimed.
    // `cross_copy_pairs` MUST be 0 — the alphabet rotation makes copies
    // shingle-disjoint, so any cross-copy edge means the blow-up leaked
    // similarity and the pair evidence is meaningless. `pairs` itself is
    // NOT gated ×N: each rotation re-draws every token hash, and over
    // the synthetic corpus's tiny vocabulary the probabilistic
    // candidate counts (simhash Hamming balls especially) vary per
    // draw — the gated invariants are cc_rounds and out_rows.
    val copyOf = (c: org.apache.spark.sql.Column) =>
      call_function("div", c, lit(100000000L))
    val cross = pairs.filter(copyOf(col("a")) =!= copyOf(col("b"))).count()
    r.copy(evidence = r.evidence ++ Map(
      "pairs" -> pairs.count(), "cross_copy_pairs" -> cross))
  }

  private def runAsof(s: SparkSession, evDir: String,
      bucketed: Boolean): OpResult = {
    val (clicks, purchases) = clicksAndPurchases(s, evDir)
    timed {
      (if (bucketed)
        AsofJoin.asofBucketed(clicks, purchases, Seq("user_id"), "ts", "ts",
          payload = Seq("pid", "value"), tiebreak = "pid", prefix = "p_",
          bucketWidth = 6L * 3600 * 1000000)
      else
        AsofJoin.asof(clicks, purchases, Seq("user_id"), "ts", "ts",
          payload = Seq("pid", "value"), tiebreak = "pid", prefix = "p_")
      ).count()
    }(Map.empty)
  }

  private def runRangeJoin(s: SparkSession, evDir: String): OpResult = {
    val ev = s.read.parquet(evDir)
      .withColumn("ts_us", expr("ts div 1000"))
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "ts_us", "event_id")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts_us", "event_id")
    val r = timed {
      RangeJoin.intervalJoin(clicks, purchases, Seq("user_id"),
        "ts_us", "ts_us", lower = 0L, upper = 3600L * 1000000L).count()
    }(Map.empty)
    r.copy(evidence = r.evidence + ("candidates" ->
      intervalCandidates(clicks, purchases, Seq("user_id"),
        "ts_us", "ts_us", 0L, 3600L * 1000000L)))
  }

  private def runPackBudget(s: SparkSession, docsDir: String): OpResult = {
    val toks = s.read.parquet(docsDir).select(col("doc_id"),
      TextFunctions.bpeTokenCount(col("text")).cast("long").as("n_tok"))
    def packed = Packing.packByBudget(toks, "doc_id", "n_tok", budget = 2048L)
    val r = timed { packed.count() }(Map.empty)
    r.copy(evidence = r.evidence +
      ("bins" -> (packed.agg(max("bin")).head().getLong(0) + 1)))
  }

  private def runStreamingDedup(s: SparkSession, docsDir: String): OpResult = {
    val work = Files.createTempDirectory("graft_scale_sdedup_").toString
    val docs = s.read.parquet(docsDir).select(col("doc_id"), col("text"))
    timed {
      // duplicate feed across two micro-batches, as in the gate query:
      // every drop in batch 2 crosses the state-store boundary
      docs.write.parquet(s"$work/in")
      docs.write.mode("append").parquet(s"$work/in")
      val stream = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 32).parquet(s"$work/in")
      val q = streaming.StreamingDedup.firstSeen(stream)
        .toDF("doc_id", "fp")
        .writeStream
        .option("checkpointLocation", s"$work/ckpt")
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("append").parquet(s"$work/out")
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(s"$work/out").count()
    }(Map.empty)
  }

  // ------------------------------------------------------------------ main

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SCALE_BASE",
      "/root/testdata/sf0.1")
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
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

    // materialize ×1 and ×N inputs through the SAME write path, so the
    // two measurements scan identically-laid-out parquet
    val work = Files.createTempDirectory("graft_scale_").toString
    val docs = spark.read.parquet(s"$base/documents.parquet")
    val ev = spark.read.parquet(s"$base/events.parquet")
    blowUpDocuments(docs, 1).write.parquet(s"$work/docs1")
    blowUpDocuments(docs, n).write.parquet(s"$work/docsN")
    blowUpEvents(ev, 1).write.parquet(s"$work/ev1")
    blowUpEvents(ev, n).write.parquet(s"$work/evN")

    val ops: Seq[(String, (String, String) => OpResult)] = Seq(
      "dedup_clusters" -> ((d: String, _: String) => runDedupClusters(spark, d)),
      "asof_join" -> ((_: String, e: String) => runAsof(spark, e, bucketed = false)),
      "asof_join_bucketed" -> ((_: String, e: String) => runAsof(spark, e, bucketed = true)),
      "range_join" -> ((_: String, e: String) => runRangeJoin(spark, e)),
      "pack_budget" -> ((d: String, _: String) => runPackBudget(spark, d)),
      "streaming_dedup" -> ((d: String, _: String) => runStreamingDedup(spark, d)))

    // warmup outside all timings
    spark.read.parquet(s"$work/docs1").count()
    spark.read.parquet(s"$work/ev1").count()

    def measure(fn: (String, String) => OpResult, docsDir: String,
        evDir: String): OpResult = {
      // min-of-2: shared-host steal stalls are bursty; evidence values
      // are deterministic so either run's are valid
      val a = fn(docsDir, evDir)
      spark.catalog.clearCache()
      val b = fn(docsDir, evDir)
      spark.catalog.clearCache()
      OpResult(math.min(a.secs, b.secs), b.evidence)
    }

    val rows = ops.map { case (name, fn) =>
      val at1 = measure(fn, s"$work/docs1", s"$work/ev1")
      val atN = measure(fn, s"$work/docsN", s"$work/evN")
      val ratio = atN.secs / math.max(at1.secs, 1e-9)
      val exponent = math.log(ratio) / math.log(n.toDouble)
      val structuralOk = name match {
        case "dedup_clusters" =>
          atN.evidence("cc_rounds") <= at1.evidence("cc_rounds") + 2 &&
            atN.evidence("cross_copy_pairs") == 0L
        case "range_join" =>
          atN.evidence("candidates") <=
            (at1.evidence("candidates") * n * 1.5).toLong
        case _ =>
          atN.evidence("out_rows") == at1.evidence("out_rows") * n
      }
      val superlinear =
        (exponent > ExponentSlack && atN.secs > MinScaledSecs) || !structuralOk
      (name, at1, atN, ratio, exponent, structuralOk, superlinear)
    }

    def evJson(m: Map[String, Long]): String =
      m.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }
        .mkString("{", ",", "}")
    def r4(d: Double): Double = math.rint(d * 1e4) / 1e4
    val opsJson = rows.map { case (name, a1, aN, ratio, exp, sOk, sl) =>
      s""""$name":{"t_base":${r4(a1.secs)},"t_scaled":${r4(aN.secs)},""" +
        s""""time_ratio":${r4(ratio)},"exponent":${r4(exp)},""" +
        s""""evidence_base":${evJson(a1.evidence)},""" +
        s""""evidence_scaled":${evJson(aN.evidence)},""" +
        s""""structural_ok":$sOk,"superlinear":$sl}"""
    }.mkString("{", ",", "}")
    val slCount = rows.count(_._7)
    val line =
      s"""{"metric":"scale","base":"$base","scale":$n,""" +
        s""""ops":$opsJson,"superlinear_count":$slCount}"""
    println(line)
    Files.write(Paths.get(sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT",
        "BENCH_scale.json")),
      (line + "\n").getBytes(StandardCharsets.UTF_8))
    spark.stop()
  }
}
