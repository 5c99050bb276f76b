package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.operators.{AsofJoin, Clustering, Cms, Cooccurrence,
  CorpusStats, Decontam, Dedup, Dsir, FuzzyJoin, Graph,
  IncrementalDedup, LangModel, Packing, RangeJoin, Sampling, Similarity}
import graft.functions.TextFunctions

/** Scale-claim validation — every operator in this engine carries a
  * "100 TB shape" argument (bounded equi-joins, O(log n) rounds, no
  * global window); this main MEASURES those claims instead of asserting
  * them. It blows the sf0.1 tables up ×N with structure-preserving
  * transforms, runs the scale-argued operator set (including the
  * composed corpus_clean pipeline, the streaming as-of enrich, the ANN
  * family, decontamination, and the incremental-dedup store) at
  * ×1 and ×N, and records both wall time and load-independent
  * STRUCTURAL evidence:
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
  *     stays sub-superlinear;
  *   - `ann_lsh` / `ann_ivf` / `ann_quantized`: a FIXED query set must
  *     return k×queries rows at every scale while the histogram-derived
  *     candidate volume grows at most ~linearly;
  *   - `decontam_ngram`: inverted-index candidate cells grow ~N with
  *     ZERO cross-copy collisions;
  *   - `dedup_incremental`: a fixed probe batch ingests into a ×1- vs
  *     ×N-seeded signature store — identical emitted pairs, exponent
  *     near 0 (per-batch cost tracks batch size, not corpus size).
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

  /** Copies collide silently if a base id reaches the per-copy offset —
    * fail loudly instead of misattributing cross-copy evidence. */
  private def assertIdsBelow(df: DataFrame, idCol: String,
      bound: Long): Unit = {
    val m = df.agg(max(col(idCol))).head()
    val v = if (m.isNullAt(0)) 0L else m.getAs[Number](0).longValue
    require(v < bound, s"blow-up offset too small: max($idCol)=$v >= " +
      s"$bound — copy id ranges would collide")
  }

  /** ×N documents: copy i offsets doc_id into a disjoint id range and
    * rotates the lowercase alphabet by i — a char bijection, so the
    * duplicate structure WITHIN a copy is preserved exactly (equal
    * texts stay equal, shingle-set relations are isomorphic) while
    * cross-copy shingle/fingerprint collisions vanish. Result: the
    * duplicate graph of the base corpus, replicated N times over
    * disjoint nodes — edges ∝ N, components ∝ N, max component size
    * CONSTANT, which is precisely the "independent data grows
    * linearly" regime the operators claim to scale in. n is capped at
    * 26: rotation by i ≡ 0 (mod 26) is the identity, which would
    * recreate exact cross-copy duplicates and invalidate the
    * cross_copy_pairs == 0 gate. */
  def blowUpDocuments(docs: DataFrame, n: Int): DataFrame = {
    require(n >= 1 && n <= 26,
      s"scale n=$n must be in [1, 26] (rotation 26 is the identity)")
    assertIdsBelow(docs, "doc_id", 100000000L)
    (0 until n).map(docCopy(docs, _)).reduce(_ unionByName _)
  }

  /** Copy `i` of a document corpus: disjoint id range + alphabet
    * rotation `i` (see [[blowUpDocuments]]). Exposed so runners can
    * build a probe batch whose copy index is disjoint from every
    * blow-up copy (e.g. the incremental-dedup fixed batch). */
  def docCopy(docs: DataFrame, i: Int): DataFrame = {
    val rot = Alphabet.drop(i % 26) + Alphabet.take(i % 26)
    docs.select(
      (col("doc_id") + lit(i.toLong * 100000000L)).as("doc_id"),
      (if (i % 26 == 0) col("text")
       else translate(col("text"), Alphabet, rot)).as("text"),
      col("lang"), col("source"), col("n_chars"))
  }

  /** ×N events: copy i offsets event_id and user_id into disjoint
    * ranges, timestamps unchanged — per-key row density stays constant
    * (the keys are new), so join fan-out per key is flat and any
    * super-linear time is the operator's fault, not the data's. */
  def blowUpEvents(ev: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"scale n=$n must be >= 1")
    assertIdsBelow(ev, "event_id", 10000000000L)
    assertIdsBelow(ev, "user_id", 100000000L)
    (0 until n).map { i =>
      ev.select(
        (col("event_id") + lit(i.toLong * 10000000000L)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(i.toLong * 100000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _)
  }

  /** ×N embeddings: copy i offsets vec_id and flips the sign of a
    * deterministic per-copy subset of dimensions. Sign flips are
    * orthonormal, so WITHIN a copy every dot product and norm — hence
    * every cosine — is preserved exactly.
    *
    * ACROSS copies there is an irreducible leak, and it is worth being
    * precise about it because no transform removes it: for a pair of
    * IDENTICAL unit vectors the cross-copy cosine under any
    * sign-diagonal scheme is Σ σ_d·u_d², whose variance is Σ u_d⁴ —
    * lower-bounded by 3/dim for sphere-typical vectors — so a ~1-4%
    * tail above a 0.45 threshold survives over the C(N,2)·V
    * identical-vector trials. Dense per-copy ROTATIONS shrink that
    * same-vector tail to ~1.6e-4 but pay for it catastrophically: the
    * relative rotation between copies turns EVERY different-vector
    * cross pair into a generic N(0, 1/dim) trial — C(N,2)·V² of them —
    * which nets out orders of magnitude MORE leaked pairs (measured
    * both ways on this corpus). Sign flips keep the leak confined to
    * the identical/near-dup trial classes, whose count is known, so
    * the harness gates emb_cross_pairs against an analytic bound over
    * exactly those trials (see the corpus_clean gate) instead of an
    * unattainable zero. Copies are also rotated relative to the fixed
    * LSH hyperplanes, so per-copy bucket recall varies; within-copy
    * pair evidence is therefore gated against the rotation-invariant
    * TRUE pair count, never exact ×N. Copy 0 is the identity (the ×1
    * measurement scans byte-identical data). */
  def blowUpEmbeddings(emb: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"scale n=$n must be >= 1")
    assertIdsBelow(emb, "vec_id", 100000000L)
    (0 until n).map { i =>
      emb.select(
        (col("vec_id") + lit(i.toLong * 100000000L)).as("vec_id"),
        (if (i == 0) col("embedding")
         else transform(col("embedding"), (x, d) =>
           when(pmod(xxhash64(lit(i), d), lit(2)) === 0, x).otherwise(-x))
           .cast("array<float>")).as("embedding"),
        col("label"))
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

  /** Every temp dir created by a run, deleted in main's finally — bench
    * runs must not accumulate multi-GB orphans under /tmp. */
  private val tempDirs = scala.collection.mutable.Buffer.empty[String]

  private def newTempDir(prefix: String): String = {
    val d = Files.createTempDirectory(prefix).toString
    tempDirs += d
    d
  }

  private def deleteRecursively(path: String): Unit =
    try {
      import scala.jdk.CollectionConverters._
      val root = Paths.get(path)
      if (Files.exists(root))
        Files.walk(root).iterator().asScala.toSeq.reverse
          .foreach(p => Files.deleteIfExists(p))
    } catch { case _: Throwable => () } // best-effort hygiene

  private def clicksAndPurchases(s: SparkSession, evDir: String)
      : (DataFrame, DataFrame) = {
    val raw = s.read.parquet(evDir)
    val ev = raw.withColumn("ts", graft.sources.EventTs.asTimestamp(raw))
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

  private def runDedupClusters(s: SparkSession, dir: String): OpResult = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
    // mirror the shipped query shape: one tokenization pass, persisted
    // signature frame feeding both pair generators
    def pairsFrom(sg: DataFrame) =
      Dedup.minhashDedupPairsFromSets(sg).select("a", "b")
        .unionByName(Dedup.simhashPairsBlockedFromSigs(sg).select("a", "b"))
    def pairs = pairsFrom(Dedup.textSignatures(docs, "doc_id", "text", n = 3))
    val sigs = Dedup.textSignatures(docs, "doc_id", "text", n = 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val r = try timed {
      Clustering.canonicalize(docs.select("doc_id"), pairsFrom(sigs),
        "doc_id").count()
    }(Map("cc_rounds" -> Clustering.lastStats.rounds.toLong))
    finally sigs.unpersist(blocking = false)
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

  private def runAsof(s: SparkSession, dir: String,
      bucketed: Boolean): OpResult = {
    val (clicks, purchases) = clicksAndPurchases(s, s"$dir/events.parquet")
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

  private def runRangeJoin(s: SparkSession, dir: String): OpResult = {
    val evRaw = s.read.parquet(s"$dir/events.parquet")
    val ev = evRaw.withColumn("ts_us", graft.sources.EventTs.asMicros(evRaw))
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

  private def runPackBudget(s: SparkSession, dir: String): OpResult = {
    val toks = s.read.parquet(s"$dir/documents.parquet").select(col("doc_id"),
      TextFunctions.bpeTokenCount(col("text")).cast("long").as("n_tok"))
    def packed = Packing.packByBudget(toks, "doc_id", "n_tok", budget = 2048L)
    val r = timed { packed.count() }(Map.empty)
    r.copy(evidence = r.evidence +
      ("bins" -> (packed.agg(max("bin")).head().getLong(0) + 1)))
  }

  private def runStreamingDedup(s: SparkSession, dir: String): OpResult = {
    val work = newTempDir("graft_scale_sdedup_")
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // duplicate feed across two micro-batches, as in the gate query:
    // every drop in batch 2 crosses the state-store boundary. Writing
    // the feed is linear input prep, not state-store cost — timing it
    // would dilute the fitted exponent toward 1, masking genuinely
    // superlinear state behavior.
    docs.write.parquet(s"$work/in")
    docs.write.mode("append").parquet(s"$work/in")
    timed {
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

  /** The composed corpus-clean pipeline (the shipped `corpus_clean`
    * query verbatim): pairs from three modalities → CC → keep-one →
    * token count → packing → split/shard. The timed action folds the
    * packing-bin count into the same aggregation that forces execution,
    * so the bins evidence costs nothing extra; pair volumes per modality
    * are recomputed untimed. */
  private def runCorpusClean(s: SparkSession, dir: String): OpResult = {
    var bins = 0L
    val r = timed {
      val row = SparkEntry.queries("corpus_clean")(s, dir)
        .agg(count(lit(1)), max("bin")).head()
      bins = row.getLong(1) + 1
      row.getLong(0)
    }(Map("cc_rounds" -> Clustering.lastStats.rounds.toLong,
      "bins" -> bins))
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val sigs = Dedup.textSignatures(docs, "doc_id", "text", n = 3)
    val copyOf = (c: org.apache.spark.sql.Column) =>
      call_function("div", c, lit(100000000L))
    def crossCount(pairs: DataFrame): Long =
      pairs.filter(copyOf(col("a")) =!= copyOf(col("b"))).count()
    val textPairs = Dedup.minhashDedupPairsFromSets(sigs).select("a", "b")
      .unionByName(Dedup.simhashPairsBlockedFromSigs(sigs).select("a", "b"))
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val embPairs = graft.operators.Similarity.lshCosinePairs(emb,
      threshold = 0.45, bits = 8, probeDist = 1, tables = 4, native = true)
      .select("a", "b")
    // The TRUE within-copy cosine-pair count is invariant under the
    // sign-flip blow-up (orthogonal transform), so the base brute-force
    // count bounds every copy's LSH yield: emb_pairs(×N) ≤ N × truth(×1)
    // is a HARD invariant even though per-copy LSH recall varies with
    // the rotation. Brute force runs on the ×1 corpus only (quadratic).
    val embTrue =
      if (dir.endsWith("/x1"))
        Map("emb_true_pairs" -> graft.operators.Similarity.cosinePairs(
          emb, threshold = 0.45).count(),
          "emb_vectors" -> emb.count())
      else Map.empty[String, Long]
    r.copy(evidence = r.evidence ++ embTrue ++ Map(
      "text_pairs" -> textPairs.count(),
      "text_cross_pairs" -> crossCount(textPairs),
      "emb_pairs" -> embPairs.count(),
      "emb_cross_pairs" -> crossCount(embPairs)))
  }

  /** The six-stage corpus_clean_v5 pipeline (dedup → domain gate → LM
    * → DECONTAM → DSIR → mixture/pack/split) at ×N. The corpus-trained
    * stages (KMV domain thresholds, LM smoothing denominator, DSIR
    * bucket priors) mix copies by design, so per-copy outputs are
    * near- but not bit-replicated — out_rows is gated as a band, not
    * an equality (the per-stage operators carry their own exact ×N
    * gates). The spliced decontam stage's scale claim IS exact: its
    * candidate cells are a subset of the full-corpus inverted-index
    * cells measured here — cross-copy cells ZERO (alphabet rotation
    * leaves no shared 5-gram), total cells ~N. */
  private def runCorpusCleanV5(s: SparkSession, dir: String): OpResult = {
    var bins = 0L
    val r = timed {
      val row = SparkEntry.queries("corpus_clean_v5")(s, dir)
        .agg(count(lit(1)), max("bin")).head()
      bins = row.getLong(1) + 1
      row.getLong(0)
    }(Map("bins" -> bins))
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .repartition(s.sparkContext.defaultParallelism)
    val bench = docs
      .filter(graft.operators.Sampling.hashBucket(col("doc_id"), 10) === 0)
      .select(col("doc_id").as("bench_id"), col("text"))
    val cells = Decontam.overlapPairs(docs, bench, "doc_id", "text",
      "bench_id", "text", n = 5)
    val copyOf = (c: org.apache.spark.sql.Column) =>
      call_function("div", c, lit(100000000L))
    val cRow = cells.agg(count(lit(1)),
      coalesce(sum((copyOf(col("doc_id")) =!= copyOf(col("bench_id")))
        .cast("long")), lit(0L))).head()
    r.copy(evidence = r.evidence ++ Map(
      "dc_cells" -> cRow.getLong(0),
      "dc_cross_cells" -> cRow.getLong(1)))
  }

  /** The seven-stage corpus_clean_v6 pipeline (v5 + SemDeDup spliced
    * before DSIR) at ×N. Same gating posture as v5: the spliced
    * DECONTAM stage carries the exact structural claims (zero
    * cross-copy inverted-index cells, cells ~N); the SEMANTIC stage is
    * the dedup_semantic operator reused verbatim on a survivor-
    * RESTRICTED (strictly smaller) pair space, whose nlist-∝-corpus
    * scale path is gated by dedup_semantic's own ×N candidates gate —
    * here its full-table verdict count rides as reported evidence
    * (cluster geometry retrains on the blown corpus, so per-copy
    * verdicts legitimately redraw). */
  private def runCorpusCleanV6(s: SparkSession, dir: String): OpResult = {
    var bins = 0L
    val r = timed {
      val row = SparkEntry.queries("corpus_clean_v6")(s, dir)
        .agg(count(lit(1)), max("bin")).head()
      bins = row.getLong(1) + 1
      row.getLong(0)
    }(Map("bins" -> bins))
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .repartition(s.sparkContext.defaultParallelism)
    val bench = docs
      .filter(graft.operators.Sampling.hashBucket(col("doc_id"), 10) === 0)
      .select(col("doc_id").as("bench_id"), col("text"))
    val cells = Decontam.overlapPairs(docs, bench, "doc_id", "text",
      "bench_id", "text", n = 5)
    val copyOf = (c: org.apache.spark.sql.Column) =>
      call_function("div", c, lit(100000000L))
    val cRow = cells.agg(count(lit(1)),
      coalesce(sum((copyOf(col("doc_id")) =!= copyOf(col("bench_id")))
        .cast("long")), lit(0L))).head()
    val semPairs = graft.operators.Similarity.semanticDupes(
      s.read.parquet(s"$dir/embeddings.parquet"), threshold = 0.45,
      native = true)
      .filter(col("is_dup") === 1).count()
    r.copy(evidence = r.evidence ++ Map(
      "dc_cells" -> cRow.getLong(0),
      "dc_cross_cells" -> cRow.getLong(1),
      "sem_pairs" -> semPairs))
  }

  /** Streaming as-of enrich: the blown-up click feed replayed as four
    * micro-batches against the static purchase history. Input
    * materialization is prep (untimed); the timed span is the streaming
    * replay plus reading back the enriched output. */
  private def runStreamAsof(s: SparkSession, dir: String): OpResult = {
    val work = newTempDir("graft_scale_sasof_")
    val (clicks, purchases) = clicksAndPurchases(s, s"$dir/events.parquet")
    clicks.repartition(4).write.parquet(s"$work/in")
    timed {
      val stream = s.readStream.schema(clicks.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$work/in")
      val q = streaming.StreamJoins.streamAsofEnrich(stream,
        () => purchases, Seq("user_id"), "ts", "ts",
        payload = Seq("pid", "value"), tiebreak = "pid",
        prefix = "p_") { (batch, _) =>
        batch.write.mode("append").parquet(s"$work/out")
      }
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(s"$work/out").count()
    }(Map.empty)
  }

  /** ANN family: the 10 fixed queries (copy-0 ids < 10) probe a corpus
    * that grows ×N. out_rows must stay k×queries = 50 at every scale;
    * the scan/bucketing cost is linear by construction, and the
    * candidate volume — the only thing that could quietly go quadratic
    * — is gated from bucket histograms computed untimed. */
  private def runAnn(s: SparkSession, dir: String,
      which: String): OpResult = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
    val r = timed {
      (which match {
        case "lsh" => Similarity.lshTopK(emb, queries, k = 5,
          bits = 8, probeDist = 1, native = true)
        case "ivf" => Similarity.ivfTopK(emb, queries, k = 5,
          nlist = 16, nprobe = 4, native = true)
        case "quantized" => Similarity.quantizedTopK(emb, queries, k = 5,
          rescore = 30, native = true)
      }).count()
    }(Map.empty)
    val cands = which match {
      case "lsh" => Similarity.lshCandidateCount(emb, queries,
        bits = 8, probeDist = 1)
      case "ivf" => Similarity.ivfCandidateCount(emb, queries,
        nlist = 16, nprobe = 4, native = true)
      // the quantized coarse pass scans every corpus vector per query
      // — exactly linear by construction
      case "quantized" => (emb.count() - 1) * queries.count()
    }
    r.copy(evidence = r.evidence + ("candidates" -> cands))
  }

  /** Decontamination: inverted-index candidate volume (Σ_h docs(h) ×
    * bench(h)) must grow ~N, and cross-copy candidates must be ZERO —
    * the alphabet rotation makes copies shingle-disjoint, so any
    * cross-copy collision means the evidence is meaningless. Both
    * counts come from per-hash histograms, untimed. */
  private def runDecontam(s: SparkSession, dir: String): OpResult = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .repartition(s.sparkContext.defaultParallelism)
    def bench = docs
      .filter(Sampling.hashBucket(col("doc_id"), 10) === 0)
      .select(col("doc_id").as("bench_id"), col("text"))
    val r = timed {
      Decontam.flag(docs, bench, "doc_id", "text", "bench_id", "text",
        n = 5, minMatched = 5L, minOverlap = 0.5).count()
    }(Map.empty)
    def hset(t: Column) =
      call_function("hashed_shingles", TextFunctions.tokens(t), lit(5))
    val copyOf = (c: Column) => call_function("div", c, lit(100000000L))
    val dh = docs
      .select(copyOf(col("doc_id")).as("dcopy"),
        explode(hset(col("text"))).as("h"))
      .groupBy("dcopy", "h").agg(count(lit(1)).as("dc"))
    val bh = bench
      .select(col("bench_id"), explode(hset(col("text"))).as("h"))
      .distinct()
      .select(copyOf(col("bench_id")).as("bcopy"), col("h"))
      .groupBy("bcopy", "h").agg(count(lit(1)).as("bc"))
    val cells = dh.join(bh, "h")
      .agg(coalesce(sum(col("dc") * col("bc")), lit(0L)),
        coalesce(sum(when(col("dcopy") =!= col("bcopy"),
          col("dc") * col("bc")).otherwise(lit(0L))), lit(0L)))
      .head()
    r.copy(evidence = r.evidence ++ Map(
      "candidates" -> cells.getLong(0),
      "cross_candidates" -> cells.getLong(1)))
  }

  /** Bloom-filter decontamination at ×N runs the documented 100 TB
    * configuration — the filter width scales with the benchmark
    * (m ∝ bench n-grams, the SemDeDup `nlist ∝ corpus` posture), so
    * the fp rate stays constant while the filter stays mBits BITS of
    * broadcast state. Gates: every doc gets a verdict row (×N exact),
    * the distinct set-position count respects the mBits bound at both
    * scales (the bounded-state claim), and the one-sided guarantee
    * (bloom ≥ exact, per doc) holds unbroken at scale. */
  private def runDecontamBloom(s: SparkSession, dir: String,
      m: Int): OpResult = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .repartition(s.sparkContext.defaultParallelism)
    def bench = docs
      .filter(Sampling.hashBucket(col("doc_id"), 10) === 0)
      .select(col("text"))
    // next power of two ≥ 2^16·m: width tracks the benchmark's growth
    val mBits = Integer.highestOneBit(m) * (1 << 16) *
      (if (Integer.bitCount(m) > 1) 2 else 1)
    def flagged = Decontam.flagBloom(docs, bench, "doc_id", "text",
      "text", n = 5, mBits = mBits, k = 3,
      minMatched = 5L, minOverlap = 0.5)
    val r = timed { flagged.count() }(Map.empty)
    def hset(t: Column) =
      call_function("hashed_shingles", TextFunctions.tokens(t), lit(5))
    val positions = bench
      .select(explode(hset(col("text"))).as("h"))
      .select(explode(array((0 until 3).map(j =>
        Decontam.bloomPos(col("h"), j, mBits)): _*)).as("pos"))
      .distinct().count()
    val violations = flagged
      .filter(col("bloom_matched") < col("exact_matched")).count()
    r.copy(evidence = r.evidence ++ Map(
      "positions" -> positions, "m_bits" -> mBits.toLong,
      "violations" -> violations))
  }

  /** Global rank at ×N: the two-pass distributed row_number must emit a
    * DENSE 0-based cover of [0, rows) at every scale — max rank + 1
    * equals the row count and min is 0 (a broken offset seed or a
    * dropped partition breaks the identity) — with only the one range
    * shuffle (time ~linear; a single-partition window would send the
    * ×N corpus through one task and crash the exponent). */
  private def runGlobalRank(s: SparkSession, dir: String): OpResult = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
    var maxRank = 0L
    var minRank = 0L
    val r = timed {
      val ranked = graft.operators.GlobalRank.rank(
        docs.select(col("doc_id"),
          round(TextFunctions.qualityScore(col("text")), 6).as("q")),
        Seq(col("q").desc, col("doc_id")), "rank")
      val row = ranked.agg(count(lit(1)), max("rank"), min("rank")).head()
      maxRank = row.getLong(1); minRank = row.getLong(2)
      row.getLong(0)
    }(Map.empty)
    r.copy(evidence = r.evidence ++ Map(
      "max_rank" -> maxRank, "min_rank" -> minRank))
  }

  /** Exact n-gram Jaccard via prefix filtering at ×N: the TRUE pair
    * set replicates exactly ×N (the alphabet rotation is a shingle-set
    * isomorphism, so within-copy Jaccard values are unchanged), while
    * the prefix-posting candidate volume — the cost the prefix filter
    * exists to bound — must grow ~N with ZERO cross-copy candidates.
    * Candidate counts come from a per-(hash, copy) posting histogram:
    * per hash, total-choose-2 minus the within-copy choose-2 sum is
    * the cross volume; never materializes the pairs. Per-copy counts
    * are independent hash draws (prefix membership re-rolls per
    * rotation), hence the 2× slack on the linear gate. */
  /** Duplicate-span detection at ×N: the alphabet rotation is a token
    * bijection, so every copy reproduces the base corpus's span
    * structure exactly — spans must replicate ×N row-for-row, the
    * duplicated-hash posting volume must be EXACTLY ×N, and cross-copy
    * duplicated hashes must be ZERO. Evidence comes from a per-hash
    * histogram, untimed. */
  private def runDedupSpans(s: SparkSession, dir: String): OpResult = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val r = timed {
      Dedup.duplicateSpans(docs, "doc_id", "text", n = 3).count()
    }(Map.empty)
    val copyOf = (c: Column) => call_function("div", c, lit(100000000L))
    val perHash = Dedup.hashedShingleSets(docs, "doc_id", "text", 3)
      .select(copyOf(col("doc_id")).as("copy"), col("doc_id"),
        explode(col("hs")).as("h"))
      .groupBy("h")
      .agg(countDistinct(col("doc_id")).as("nd"),
        countDistinct(col("copy")).as("nc"))
      .filter(col("nd") >= 2)
    val row = perHash.agg(
      coalesce(sum(col("nd")), lit(0L)).cast("long"),
      coalesce(sum(when(col("nc") >= 2, 1L).otherwise(0L)), lit(0L))
        .cast("long")).head()
    r.copy(evidence = r.evidence ++ Map(
      "candidates" -> row.getLong(0),
      "cross_dup_hashes" -> row.getLong(1)))
  }

  /** SemDeDup at ×N runs the documented 100 TB configuration — `nlist`
    * scales with the corpus, so the per-cluster pair space (Σ_b C(s_b,2),
    * the quadratic term the clustering exists to bound) stays ~linear.
    * Every vector gets exactly one verdict row at any scale. */
  private def runSemanticDedup(s: SparkSession, dir: String,
      m: Int): OpResult = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val nlist = 16 * m
    val r = timed {
      Similarity.semanticDupes(emb, threshold = 0.45, nlist = nlist,
        native = true).count()
    }(Map.empty)
    val cents = Similarity.kmeansCentroids(emb, dim = 64, k = nlist)
    val cands = emb
      .select(Similarity.nearestCentroid(
        col("embedding").cast("array<double>"), cents, native = true)
        .as("b"))
      .groupBy("b").agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(col("c") * (col("c") - 1) / 2), lit(0.0))
        .cast("long")).head().getLong(0)
    r.copy(evidence = r.evidence ++ Map(
      "candidates" -> cands, "nlist" -> nlist.toLong))
  }

  /** Bounded-quantile sketch at ×N: output is |quantiles| rows and the
    * sample is exactly k rows at EVERY corpus size — the whole point of
    * the KMV bound. Time should track the single scan. */
  private def runStatsQuantiles(s: SparkSession, dir: String): OpResult = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
    var nSample = 0L
    val r = timed {
      val rows = CorpusStats.boundedQuantiles(docs, "doc_id",
        CorpusStats.tokenMeasure(col("text"))).collect()
      nSample = rows.map(_.getAs[Long]("n_sample")).max
      rows.length.toLong
    }(Map.empty)
    r.copy(evidence = r.evidence + ("n_sample" -> nSample))
  }

  /** Line-level global dedup at ×N: pages are pure functions of the
    * text (8-token chunk lines, no id-derived decoration), so the
    * alphabet rotation maps copy i's lines bijectively — per-copy kept
    * counts replicate EXACTLY ×N and cross-copy line fingerprints are
    * disjoint. */
  private def runDedupLines(s: SparkSession, dir: String): OpResult = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val toks = TextFunctions.tokens(col("text"))
    val nChunks = ((size(toks) + lit(7)) / lit(8)).cast("int")
    val page = array_join(
      when(size(toks) === 0, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), nChunks), i =>
          concat_ws(" ", slice(toks, (i - 1) * 8 + 1, lit(8))))), "\n")
    val paged = docs.select(col("doc_id"), page.as("text"))
    var sumKept = 0L
    val r = timed {
      val row = Dedup.dedupLines(paged, "doc_id", "text")
        .agg(count(lit(1)), sum("n_kept")).head()
      sumKept = row.getLong(1)
      row.getLong(0)
    }(Map.empty)
    val copyOf = (c: Column) => call_function("div", c, lit(100000000L))
    val cross = paged
      .select(copyOf(col("doc_id")).as("copy"),
        explode(split(col("text"), "\n")).as("line"))
      .select(col("copy"), TextFunctions.fingerprint(col("line")).as("fp"))
      .groupBy("fp").agg(countDistinct(col("copy")).as("nc"))
      .filter(col("nc") >= 2).count()
    r.copy(evidence = r.evidence ++ Map(
      "sum_kept" -> sumKept, "cross_fps" -> cross))
  }

  /** HLL at ×N: events copies hold DISJOINT user ranges, so the true
    * per-type distinct count grows exactly ×N while the sketch state
    * stays 64 one-byte registers per group — the estimate must keep
    * tracking the exact count (relative error within the m=64 bound)
    * at both scales, with constant output rows. A state blowup can't
    * hide: it would surface as broken estimates, not just time. */
  private def runSketchHll(s: SparkSession, dir: String): OpResult = {
    val ev = s.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"), col("user_id"))
    var exactSum = 0L; var worstErrPm = 0L
    val r = timed {
      val est = round(lit(graft.functions.expr.HllSketch.alpha(6)) *
        lit(4096.0) * lit(3.6028797018963968e16) /
        col("h.t").cast("double"), 4)
      val rows = ev.groupBy("event_type")
        .agg(call_function("hll_sketch",
            col("user_id").cast("string"), lit(6)).as("h"),
          countDistinct(col("user_id")).as("nd"))
        .select(est.as("est"), col("nd")).collect()
      exactSum = rows.map(_.getAs[Long]("nd")).sum
      worstErrPm = rows.map { row =>
        val (e, nd) = (row.getAs[Double]("est"), row.getAs[Long]("nd"))
        math.ceil(math.abs(e - nd) / nd * 1000).toLong
      }.max
      rows.length.toLong
    }(Map.empty)
    r.copy(evidence = r.evidence ++ Map(
      "exact_nd_sum" -> exactSum, "worst_err_permille" -> worstErrPm))
  }

  /** Per-domain relative quality filter at ×N: the alphabet rotation
    * preserves every quality signal (letters map to letters, token
    * structure unchanged), so the ×N corpus repeats the ×1 score
    * distribution n times over the SAME domains. The per-domain
    * 128-doc sample redraws over the new id range, so thresholds move
    * within sampling error — the gate pins what must hold regardless:
    * domain count constant, sample size pinned at k, and the kept
    * fraction near the requested median at both scales. */
  private def runQualityDomainFilter(s: SparkSession,
      dir: String): OpResult = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text")
    var domains = 0L; var total = 0L
    val r = timed {
      total = docs.count()
      val kept = CorpusStats.filterByDomainQuantile(docs, "doc_id",
        "source", TextFunctions.qualityScore(col("text")), p = 0.5,
        k = 128)
      val row = kept.agg(count(lit(1)),
        countDistinct(col("source"))).head()
      domains = row.getLong(1)
      row.getLong(0)
    }(Map.empty)
    r.copy(evidence = r.evidence ++ Map(
      "domains" -> domains, "total_docs" -> total,
      "kept_permille" -> (r.evidence("out_rows") * 1000 / total)))
  }

  /** Containment dedup at ×N: rotation = shingle-set isomorphism with
    * disjoint hashes across copies, so containment pairs replicate
    * EXACTLY ×N, cross-copy index collisions are zero, and the
    * prefix×full candidate volume stays ~linear (the recall-1 filter's
    * scale claim — without the prefix bound the full×full index join
    * would be quadratic in duplicated shingles). */
  private def runContainment(s: SparkSession, dir: String): OpResult = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val r = timed {
      Dedup.containmentPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.8).count()
    }(Map.empty)
    val sets = Dedup.hashedShingleSets(docs, "doc_id", "text", 3)
    val prefixLen = (floor(lit(1.0 - 0.8) * col("n_sh")) + 1).cast("int")
    val copyOf = (c: Column) => call_function("div", c, lit(100000000L))
    val pre = sets.select(copyOf(col("doc_id")).as("copy"),
        explode(slice(col("hs"), lit(1), prefixLen)).as("h"))
      .groupBy("h", "copy").agg(count(lit(1)).as("p"))
    val ful = sets.select(copyOf(col("doc_id")).as("copy"),
        explode(col("hs")).as("h"))
      .groupBy("h", "copy").agg(count(lit(1)).as("f"))
    // per hash: within-copy directed candidates p·f − p (each prefix
    // entry also appears on its own full list); cross-copy p·f' pairs
    val agg = pre.as("x").join(ful.as("y"), Seq("h"))
      .select(col("h"),
        when(col("x.copy") === col("y.copy"),
          col("p") * col("f") - col("p")).otherwise(lit(0L)).as("within"),
        when(col("x.copy") =!= col("y.copy"),
          col("p") * col("f")).otherwise(lit(0L)).as("cross"))
      .agg(coalesce(sum("within"), lit(0L)).cast("long"),
        coalesce(sum("cross"), lit(0L)).cast("long"))
      .head()
    r.copy(evidence = r.evidence ++ Map(
      "candidates" -> agg.getLong(0), "cross_candidates" -> agg.getLong(1)))
  }

  /** Streaming sessionization at ×N: event copies keep timestamps and
    * offset user ids, so every copy replays the ×1 session structure
    * over fresh keys — emitted sessions and their event sum must grow
    * EXACTLY ×N through the full 3-run watermark lifecycle (state
    * merge, closure, sentinel flush). Runs the gated SparkEntry query
    * itself, checkpoints and all. */
  private def runStreamSessions(s: SparkSession, dir: String): OpResult = {
    var sumN = 0L
    val r = timed {
      val row = SparkEntry.queries("stream_sessions")(s, dir)
        .agg(count(lit(1)), sum("n")).head()
      sumN = row.getLong(1)
      row.getLong(0)
    }(Map.empty)
    r.copy(evidence = r.evidence + ("sum_n" -> sumN))
  }

  /** CMS at ×N: the sketch must stay ≤ depth×width CELLS — constant —
    * at any corpus size (the bounded-state claim), while a fixed probe
    * set (copy-0 keys) returns one estimate per key at every scale and
    * the guarantee est ≥ exact never breaks. */
  private def runCms(s: SparkSession, dir: String): OpResult = {
    val ev = s.read.parquet(s"$dir/events.parquet").select(col("user_id"))
    val width = 64; val depth = 3
    var cells = 0L; var under = 0L
    val r = timed {
      val sketch = Cms.build(ev, "user_id", width, depth)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        cells = sketch.count()
        val probe = ev.filter(col("user_id") < 50)
        val exact = probe.groupBy("user_id")
          .agg(count(lit(1)).as("exact"))
        val est = Cms.estimate(sketch, exact, "user_id", width, depth)
        val joined = est.join(exact, "user_id")
        under = joined.filter(col("est") < col("exact")).count()
        joined.count()
      } finally sketch.unpersist(false)
    }(Map.empty)
    r.copy(evidence = r.evidence ++ Map(
      "cells" -> cells, "under_estimates" -> under))
  }

  private def runNgramJaccard(s: SparkSession, dir: String): OpResult = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val r = timed {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.8).count()
    }(Map.empty)
    val sets = Dedup.hashedShingleSets(docs, "doc_id", "text", 3)
    val prefixLen =
      (floor(lit(1.0 - 0.8) * col("n_sh")) + 1).cast("int")
    val copyOf = (c: Column) => call_function("div", c, lit(100000000L))
    val hist = sets
      .select(copyOf(col("doc_id")).as("copy"),
        explode(slice(col("hs"), lit(1), prefixLen)).as("h"))
      .groupBy("h", "copy").agg(count(lit(1)).as("c"))
    val agg = hist.groupBy("h")
      .agg(sum(col("c")).as("tot"),
        sum(col("c") * (col("c") - 1) / 2).as("within"))
      .agg(
        coalesce(sum(col("tot") * (col("tot") - 1) / 2
          - col("within")), lit(0.0)).cast("long"),
        coalesce(sum(col("within")), lit(0.0)).cast("long"))
      .head()
    r.copy(evidence = r.evidence ++ Map(
      "candidates" -> agg.getLong(1), "cross_candidates" -> agg.getLong(0)))
  }

  /** Deterministic training order at ×N: out_rows grows exactly ×N and
    * the max global position equals the row count (the permutation
    * stays a contiguous bijection at scale — a broken offset join or a
    * truncated shard rank would break the identity). The rank windows
    * stay shard-partitioned, so no single reducer sees the corpus. */
  private def runCorpusShuffle(s: SparkSession, dir: String): OpResult = {
    val docs = s.read.parquet(s"$dir/documents.parquet").select("doc_id")
    var maxPos = 0L
    val r = timed {
      val row = Sampling.trainingOrder(docs, "doc_id", shards = 16)
        .agg(count(lit(1)), max("global_pos")).head()
      maxPos = row.getLong(1)
      row.getLong(0)
    }(Map.empty)
    r.copy(evidence = r.evidence + ("max_global_pos" -> maxPos))
  }

  /** Corpus bigram LM scoring at ×N: every doc (with ≥ 2 tokens) gets a
    * score row, so out_rows must grow ×N exactly. The model table is
    * bounded by OBSERVED bigram types — under the disjoint alphabet
    * rotations each copy contributes its own types, so `model_types`
    * must grow ×N exactly (a cross-copy type collision would merge rows
    * and show here as a shortfall). Per-copy isomorphism means every
    * copy reproduces the base corpus's count structure, so the ×N
    * corpus collapses to (≈) the ×1 set of distinct
    * `(n_bigrams, lm_score)` profiles — scores are copy-local; only the
    * global vocabulary smoothing term shifts them, identically for
    * every copy (1% slack: the shift can merge/split 6-decimal ties). */
  private def runLmScore(s: SparkSession, dir: String): OpResult = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
      .repartition(s.sparkContext.defaultParallelism)
    var distinct = 0L
    val r = timed {
      val row = LangModel.score(docs, "doc_id", "text")
        .agg(count(lit(1)),
          countDistinct(struct(col("n_bigrams"), col("lm_score"))))
        .head()
      distinct = row.getLong(1)
      row.getLong(0)
    }(Map.empty)
    // evidence-only pass, outside the timing
    val types = LangModel.bigramModel(docs, "doc_id", "text").count()
    r.copy(evidence = r.evidence ++ Map(
      "model_types" -> types, "distinct_scores" -> distinct))
  }

  /** DSIR scoring at ×N: the 256-bucket model is corpus-size-INVARIANT
    * state (the bounded-model claim — two B-row aggregates plus one
    * scan-local fold, the corpus never shuffles), every doc gets
    * exactly one score row, and token mass is rotation-invariant
    * (translate only maps letters, never whitespace), so out_rows and
    * token_sum must replicate exactly ×N while the model width stays
    * flat. Weights themselves differ per copy (rotation redistributes
    * vocabulary across buckets) — deliberately not gated. */
  private def runDsir(s: SparkSession, dir: String): OpResult = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "text")
      .repartition(s.sparkContext.defaultParallelism)
    var tokSum = 0L
    val r = timed {
      val scored = Dsir.score(docs, docs.filter(col("lang") === "en"),
        "doc_id", "text", buckets = 256)
      val row = scored
        .agg(count(lit(1)), coalesce(sum(col("n_tokens")), lit(0L)))
        .head()
      tokSum = row.getLong(1)
      row.getLong(0)
    }(Map.empty)
    r.copy(evidence = r.evidence ++ Map(
      "model_buckets" -> 256L, "token_sum" -> tokSum))
  }

  /** PMI co-occurrence at ×N events: each copied user replays an
    * identical basket over the UNCHANGED event-type vocabulary, so the
    * pair KEY SET is scale-invariant (out_rows flat — the
    * vocab²-bounded-output claim in gate form) while pair mass and
    * group count scale exactly ×N. */
  private def runCooccur(s: SparkSession, dir: String): OpResult = {
    val ev = s.read.parquet(s"$dir/events.parquet")
      .select("user_id", "event_type")
      .repartition(s.sparkContext.defaultParallelism)
    var pairMass = 0L
    var nGroups = 0L
    val r = timed {
      val p = Cooccurrence.pmi(ev, "user_id", "event_type")
      val row = p.agg(count(lit(1)),
        coalesce(sum(col("n_pair")), lit(0L))).head()
      pairMass = row.getLong(1)
      row.getLong(0)
    }(Map.empty)
    nGroups = ev.select(countDistinct(col("user_id"))).head().getLong(0)
    r.copy(evidence = r.evidence ++ Map(
      "pair_mass" -> pairMass, "n_groups" -> nGroups))
  }

  /** PageRank at ×N: rotated copies keep the pair graph on disjoint
    * node ranges (cross-copy edges must be ZERO — exact invariant),
    * but the minhash BANDING recall is a fresh hash draw per rotated
    * copy, so borderline verified pairs (J ≥ 0.8 yet band-caught only
    * probabilistically) do NOT replicate exactly — measured 5108 vs
    * the naive 5120 at sf0.1 ×10. Gates pin what is invariant: node
    * rows exactly ×N, zero cross-copy edges, edge volume ~×N (recall
    * redraw slack), total rank mass within 2% of ×N (each missed
    * borderline edge perturbs ranks micro-locally). */
  private def runPagerank(s: SparkSession, dir: String): OpResult = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .repartition(s.sparkContext.defaultParallelism)
    var rankMass = 0L
    var nEdges = 0L
    var crossEdges = 0L
    val r = timed {
      val pairs = Dedup.minhashDedupPairs(docs, "doc_id", "text",
        n = 3, k = 16, bands = 4, threshold = 0.8)
      val edges = Graph.symmetrize(pairs, "a", "b").persist()
      try {
        val ec = edges.agg(count(lit(1)),
          coalesce(sum(when(call_function("div", col("src"),
              lit(100000000L)) =!= call_function("div", col("dst"),
              lit(100000000L)), 1L).otherwise(0L)), lit(0L))).head()
        nEdges = ec.getLong(0)
        crossEdges = ec.getLong(1)
        val pr = Graph.pageRank(docs.select(col("doc_id").as("id")),
          edges, iterations = 5)
        val row = pr
          .agg(count(lit(1)), coalesce(sum(col("rank")), lit(0L))).head()
        rankMass = row.getLong(1)
        row.getLong(0)
      } finally edges.unpersist(false)
    }(Map.empty)
    r.copy(evidence = r.evidence ++ Map(
      "rank_mass" -> rankMass, "edges" -> nEdges,
      "cross_edges" -> crossEdges))
  }

  /** Cohort retention at ×N: copied users replay identical calendars,
    * so the (cohort, offset) cell KEY SET is invariant while every
    * cell's counts scale exactly ×N. */
  private def runRetention(s: SparkSession, dir: String): OpResult = {
    val ev = s.read.parquet(s"$dir/events.parquet")
      .select("user_id", "ts")
      .repartition(s.sparkContext.defaultParallelism)
    var activeSum = 0L
    val r = timed {
      val ret = graft.operators.Cohort.retention(ev, "user_id", "ts")
      val row = ret.agg(count(lit(1)),
        coalesce(sum(col("n_active")), lit(0L))).head()
      activeSum = row.getLong(1)
      row.getLong(0)
    }(Map.empty)
    r.copy(evidence = r.evidence ++ Map("active_sum" -> activeSum))
  }

  /** Table profiling at ×N: constant-width output at any corpus size,
    * row mass exactly ×N, and a bounded-cardinality column's exact
    * distinct count stays FLAT (lang) while the key column's scales
    * exactly ×N (doc_id) — the per-column-correctness claim at scale. */
  private def runProfile(s: SparkSession, dir: String): OpResult = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .repartition(s.sparkContext.defaultParallelism)
    var rowsTotal = 0L
    var langNd = 0L
    var idNd = 0L
    val r = timed {
      val prof = graft.operators.Profiler
        .profile(docs, Seq("doc_id", "lang", "source"))
        .collect()
      rowsTotal = prof.head.getLong(1)
      langNd = prof.find(_.getString(0) == "lang").get.getLong(3)
      idNd = prof.find(_.getString(0) == "doc_id").get.getLong(3)
      prof.length.toLong
    }(Map.empty)
    r.copy(evidence = r.evidence ++ Map("rows_total" -> rowsTotal,
      "lang_nd" -> langNd, "id_nd" -> idNd))
  }

  /** k-center coreset at ×N: the output is k rows at ANY corpus size
    * and every greedy round is one scan-local pass over broadcast
    * centers, so time must track the corpus ~linearly while out_rows
    * stays flat. The picks themselves redistribute under the
    * sign-flip copies (deliberately ungated). */
  private def runCoreset(s: SparkSession, dir: String): OpResult =
    timed {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
        .repartition(s.sparkContext.defaultParallelism)
      Similarity.kCenterCoreset(emb, k = 6, native = true).count()
    }(Map.empty)

  /** Snapshot diff at ×N: drift predicates keyed on the WITHIN-COPY id
    * (`doc_id mod 1e8`), so every copy drifts identically and the
    * I/U/D class counts must replicate exactly ×N. One full outer
    * join + scan-local classification — the time exponent is the
    * one-shuffle claim. */
  private def runSnapshotDiff(s: SparkSession, dir: String): OpResult = {
    val base = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
      .repartition(s.sparkContext.defaultParallelism)
    val wid = pmod(col("doc_id"), lit(100000000L))
    val tgt = base.filter(pmod(wid, lit(11)) =!= 0)
      .withColumn("text", when(pmod(wid, lit(7)) === 0,
        concat(col("text"), lit(" drift"))).otherwise(col("text")))
      .unionByName(base.filter(pmod(wid, lit(13)) === 0)
        .select((col("doc_id") + lit(5000000000L)).as("doc_id"),
          col("lang"), col("text")))
    var nI = 0L; var nU = 0L; var nD = 0L
    val r = timed {
      val d = graft.operators.SnapshotDiff.diff(base, tgt, Seq("doc_id"))
      val row = d.agg(count(lit(1)),
        sum(when(col("_op") === "I", 1L).otherwise(0L)),
        sum(when(col("_op") === "U", 1L).otherwise(0L)),
        sum(when(col("_op") === "D", 1L).otherwise(0L))).head()
      nI = row.getLong(1); nU = row.getLong(2); nD = row.getLong(3)
      row.getLong(0)
    }(Map.empty)
    r.copy(evidence = r.evidence ++ Map(
      "n_i" -> nI, "n_u" -> nU, "n_d" -> nD))
  }

  /** Funnel at ×N: copied users replay identical event sequences, so
    * every stage's group count replicates exactly ×N; the per-stage
    * scan + group-keyed join shape is the linear-time claim. */
  private def runFunnel(s: SparkSession, dir: String): OpResult = {
    val ev = s.read.parquet(s"$dir/events.parquet")
      .select("user_id", "event_type", "ts")
      .repartition(s.sparkContext.defaultParallelism)
    var s1 = 0L; var s2 = 0L; var s3 = 0L
    val r = timed {
      val rows = graft.operators.Funnel.ordered(ev, "user_id",
        "event_type", "ts", Seq("view", "click", "purchase"))
        .orderBy("stage_idx")
        .collect()
      s1 = rows(0).getLong(2); s2 = rows(1).getLong(2)
      s3 = rows(2).getLong(2)
      rows.length.toLong
    }(Map.empty)
    r.copy(evidence = r.evidence ++ Map(
      "stage1" -> s1, "stage2" -> s2, "stage3" -> s3))
  }

  /** Incremental dedup: the SAME fixed probe batch (copy 13 — id range
    * and rotation disjoint from every blow-up copy) ingests into a
    * store seeded with the ×1 corpus vs the ×N corpus. Per-batch cost
    * tracking batch size, not corpus size, IS the operator's claim, so
    * here the exponent measures store-size dependence and should sit
    * near 0 — and the emitted pairs must be IDENTICAL (the batch can
    * only pair within itself; its shingles collide with no store copy). */
  private def runIncDedup(s: SparkSession, dir: String,
      batch: DataFrame): OpResult = {
    val store = newTempDir("graft_scale_inc_")
    val corpus = s.read.parquet(s"$dir/documents.parquet")
    // seeding is corpus-sized prep, not the measured ingest
    IncrementalDedup.ingest(corpus, "doc_id", "text", store, batchId = 0L)
    val r = timed {
      IncrementalDedup.ingest(batch, "doc_id", "text", store,
        batchId = 1L).count()
    }(Map.empty)
    r.copy(evidence = r.evidence ++ Map(
      "store_docs" -> corpus.count(), "batch_docs" -> batch.count()))
  }

  /** Store compaction at ×N: seed a store with the corpus split across
    * 4 ingests (so every bucket holds several small batch partitions —
    * the small-files state compaction exists to fix), then time ONE
    * compact. Claims under test: the folded layout is O(buckets) files
    * at EVERY scale (scale-invariant file count, one file per bucket
    * per store dir), compaction cost is ~linear in store size
    * (exponent gate), and behavior is unchanged — an untimed probe
    * ingest after the fold emits the identical pair set at both scales
    * (the probe's rotation collides with no store copy, so its pairs
    * are scale-independent by construction). */
  private def runCompact(s: SparkSession, dir: String,
      batch: DataFrame): OpResult = {
    val store = newTempDir("graft_scale_cmp_")
    val corpus = s.read.parquet(s"$dir/documents.parquet")
    (0 until 4).foreach { i =>
      IncrementalDedup.ingest(
        corpus.filter(pmod(col("doc_id"), lit(4)) === i),
        "doc_id", "text", store, batchId = i.toLong)
    }
    val before = storeFiles(store)
    val t0 = System.nanoTime()
    IncrementalDedup.compact(s, store)
    val secs = (System.nanoTime() - t0) / 1e9
    val after = storeFiles(store)
    val probePairs = IncrementalDedup.ingest(batch, "doc_id", "text",
      store, batchId = 4L).count()
    OpResult(secs, Map("out_rows" -> probePairs,
      "files_before" -> before, "files_after" -> after,
      "store_docs" -> corpus.count()))
  }

  /** The `startToJdbc` bucketed serving loop at ×N: seed a bucketed CDC
    * state from the events table — bucket count sized to the table at
    * CREATION (64 per ×1 volume), the production posture that keeps
    * rows-per-bucket scale-invariant — then push ONE fixed 64-key
    * update batch through the steady-state JDBC delta path against a
    * live, statement-counted Derby endpoint ([[graft.sources
    * .CountingDriver]]). Claims gated (CdcStream.scala O(batch)
    * docstring): database statements and connections track the BATCH —
    * identical counts at ×1 and ×N — the state read is confined to the
    * touched buckets' latest-version files (`files_read` ≪
    * `state_files`), and the pushed keys verifiably land in the serving
    * table (`out_rows` = batch keys at every scale). Seeding, the
    * serving-table bootstrap, and verification run OUTSIDE the timer.
    */
  private def runCdcServe(s: SparkSession, dir: String,
      scale: Int): OpResult = {
    import graft.sources.{CountingDriver, JdbcSink}
    CountingDriver.registered
    val work = newTempDir("graft_scale_serve_")
    val db = work.substring(work.lastIndexOf('/') + 1)
    val url = s"${CountingDriver.Prefix}derby:memory:$db;create=true"
    val nBuckets = 64 * scale
    val target = s"$work/state"
    val table = "serve_t"
    // numeric columns only: the counting prefix hides the db from
    // Spark's DerbyDialect, and the generic dialect's string mapping is
    // not a Derby type (same constraint as JdbcSinkSpec)
    val seed = s.read.parquet(s"$dir/events.parquet")
      .select(col("event_id").as("k"), col("value").as("v"),
        lit("I").as("_op"), lit(1L).as("_seq"))
    streaming.BucketedState.mergeBatch(seed, -1L, target, Seq("k"),
      nBuckets)
    val stateRows = seed.count()
    // fixed probe: the 64 smallest keys — copy 0 of the blow-up, so the
    // SAME keys exist at both scales; updates bump v by 1e6 (readable
    // back as the verification predicate)
    val probeKeys = seed.select(col("k")).orderBy(col("k")).limit(64)
      .collect().map(_.getLong(0)).toSeq
    val probe = seed
      .filter(col("k").isin(probeKeys.map(Long.box): _*))
      .select(col("k"), (col("v") + 1000000.0).as("v"),
        lit("U").as("_op"), lit(2L).as("_seq"))
    // serving-table bootstrap: the probe keys' PRE-update rows (fixed
    // size at every scale — the endpoint is the reference's ClickHouse;
    // its volume is not what the client-side counters measure)
    JdbcSink.replace(
      seed.filter(col("k").isin(probeKeys.map(Long.box): _*))
        .select(col("k"), col("v")), url, table)
    probe.coalesce(1).write.parquet(s"$work/changes")
    val st0 = CountingDriver.statements.get()
    val cn0 = CountingDriver.connects.get()
    val r = timed {
      val q = streaming.CdcStream.startToJdbc(s, s"$work/changes",
        probe.schema, target, s"$work/ckpt", Seq("k"), url, table,
        stateBuckets = Some(nBuckets))
      q.awaitTermination()
      0L
    }(Map.empty)
    val statements = CountingDriver.statements.get() - st0
    val connects = CountingDriver.connects.get() - cn0
    // verification (untimed, after the counter deltas): every probe key
    // serves its post-update value
    val served = {
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val st = conn.createStatement()
        try {
          val rs = st.executeQuery(
            s"""SELECT COUNT(*) FROM $table WHERE "v" >= 1000000""")
          rs.next(); rs.getLong(1)
        } finally st.close()
      } finally conn.close()
    }
    // what viewForKeys scanned: the touched buckets' latest
    // marker-complete versions vs the full state's file census
    val touched = probe
      .select(pmod(hash(col("k")), lit(nBuckets)).as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    def latestFiles(b: Int): Long = {
      val bd = new java.io.File(s"$target/bucket=$b")
      if (!bd.exists()) 0L
      else bd.listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("v=") &&
          new java.io.File(f, "_GRAFT_OK").exists())
        .sortBy(_.getName.stripPrefix("v=").toLong)
        .lastOption
        .map(_.listFiles().count(_.getName.endsWith(".parquet")).toLong)
        .getOrElse(0L)
    }
    val filesRead = touched.map(latestFiles).sum
    val stateFiles = {
      import scala.jdk.CollectionConverters._
      Files.walk(Paths.get(target)).iterator().asScala
        .count(_.toString.endsWith(".parquet")).toLong
    }
    try java.sql.DriverManager
      .getConnection(s"jdbc:derby:memory:$db;drop=true")
    catch { case _: Throwable => () } // 08006 = successful drop
    OpResult(r.secs, Map(
      "out_rows" -> served, "batch_keys" -> probeKeys.size.toLong,
      "statements" -> statements, "connects" -> connects,
      "touched_buckets" -> touched.size.toLong,
      "files_read" -> filesRead, "state_files" -> stateFiles,
      "state_rows" -> stateRows))
  }

  /** Edit-distance fuzzy join at ×N: matches replicate exactly ×N
    * (alphabet rotation is a char bijection, the id suffix is encoded
    * as base-26 LETTERS rotated by the same copy rotation as the text,
    * and the dirty-side deletion position is keyed on the within-copy
    * id over a copy-invariant length — the whole construction commutes
    * with the rotation), cross-copy matches are impossible (any cross
    * pair differs at ≥ 4 rotating prefix letters plus the rotated
    * suffix), cross-copy CANDIDATES are zero (copy gram spaces are
    * disjoint: every letter rotates, and all-non-letter grams are the
    * corpus-commonest, which the frequency-ascending prefix never
    * picks), and candidate volume stays ~linear (2× slack: equal-df
    * ties order differently per rotated copy). */
  private def runFuzzyJoin(s: SparkSession, dir: String): OpResult = {
    // within-copy id as 6 base-26 letters, rotated by the copy index —
    // digit d of wid becomes char('a' + (d + copy) mod 26)
    val suffix = concat((5 to 0 by -1).map { i =>
      val p = math.pow(26, i).toLong
      expr(s"char(97 + CAST(((doc_id % 100000000) DIV $p) % 26" +
        s" + (doc_id DIV 100000000) AS INT) % 26)")
    }: _*)
    // prefix keeps ONLY rotating lowercase letters: an uppercase /
    // digit / punctuation char is rotation-INVARIANT, and one rare
    // invariant gram ("1923") in a prefix would collide across every
    // copy of its documents — stripping commutes with the rotation
    // (bijection on a-z, identity elsewhere), so copy gram spaces are
    // exactly disjoint apart from the single '#', which no gram can
    // fill alone
    val ents = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        concat(substring(regexp_replace(col("text"), "[^a-z]", ""), 1, 24),
          lit("#"), suffix).as("ent"))
      .filter(length(col("ent")) >= 11) // >= 4 letters + '#' + suffix
      .repartition(s.sparkContext.defaultParallelism)
    val wid = pmod(col("doc_id"), lit(100000000L))
    val pos = (pmod(wid, length(col("ent")) - 2) + 1).cast("int")
    val dirtyPrep = ents
      .withColumn("pos", pos)
      .select(col("doc_id").as("d_id"),
        concat(col("ent").substr(lit(1), col("pos") - 1),
          col("ent").substr(col("pos") + 1, length(col("ent"))))
          .as("d_s"))
    var crossPairs = 0L
    val r = timed {
      val out = FuzzyJoin.join(dirtyPrep, "d_id", "d_s",
        ents, "doc_id", "ent", maxDist = 1)
      val row = out.agg(count(lit(1)),
        coalesce(sum((floor(col("d_id") / 100000000L) =!=
          floor(col("doc_id") / 100000000L)).cast("long")), lit(0L)))
        .head()
      crossPairs = row.getLong(1)
      row.getLong(0)
    }(Map.empty)
    val cands = FuzzyJoin.candidatePairs(dirtyPrep, "d_id", "d_s",
      ents, "doc_id", "ent", maxDist = 1)
    val cRow = cands.agg(count(lit(1)),
      coalesce(sum((floor(col("l_id") / 100000000L) =!=
        floor(col("r_id") / 100000000L)).cast("long")), lit(0L))).head()
    r.copy(evidence = r.evidence ++ Map("cross_pairs" -> crossPairs,
      "candidates" -> cRow.getLong(0),
      "cross_candidates" -> cRow.getLong(1)))
  }

  /** Short-string fuzzy join at ×N — the brute bucket's scale claim:
    * candidate volume tracks DISTINCT short strings, never rows. Left
    * maps every doc (rows ×N) onto 36 fixed 4-char "XXYY" names — a
    * duplicate-heavy corpus whose distinct-string space is CONSTANT —
    * and right is a FIXED 360-row reference slice (copy 0 only, 10
    * rows per name). XXYY doubles are pairwise dist >= 2 and
    * gram-disjoint unless identical, so at maxDist=1 matches are
    * exactly the same-name pairs: out_rows grows exactly ×N,
    * candidates == out_rows (string-grain verification emits only
    * real matches), and the distinct cross frame (36 × 36) never
    * moves. The pre-fix row-level short cross emitted
    * |shortL|·|shortR| candidates — 36× the match count here, with
    * levenshtein run on every one of them downstream. */
  private def runFuzzyShort(s: SparkSession, dir: String): OpResult = {
    val doubles = (0 until 36).map { i =>
      val a = ('a' + i / 6).toChar; val b = ('a' + i % 6).toChar
      s"$a$a$b$b"
    }
    val nameOf = element_at(
      typedLit(doubles), (pmod(col("doc_id"), lit(100000000L)) % 36 + 1)
        .cast("int"))
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val l = docs.select(col("doc_id").as("l_id"), nameOf.as("l_s"))
      .repartition(s.sparkContext.defaultParallelism)
    val r = docs
      .filter(col("doc_id") < 100000000L &&
        pmod(col("doc_id"), lit(100000000L)) < 360L)
      .select(col("doc_id").as("r_id"), nameOf.as("r_s"))
    var lRows = 0L
    val res = timed {
      val out = FuzzyJoin.join(l, "l_id", "l_s", r, "r_id", "r_s",
        maxDist = 1)
      out.count()
    }(Map.empty)
    lRows = l.count()
    val cands = FuzzyJoin.candidatePairs(l, "l_id", "l_s",
      r, "r_id", "r_s", maxDist = 1).count()
    res.copy(evidence = res.evidence ++ Map(
      "candidates" -> cands, "l_rows" -> lRows, "r_rows" -> r.count(),
      "distinct_l" -> l.select("l_s").distinct().count(),
      "distinct_r" -> r.select("r_s").distinct().count()))
  }

  /** Time-series gap fill at ×N: copied users keep their timestamps,
    * so every copy's daily structure — active days, gap days, event
    * mass — replicates exactly ×N; one aggregate shuffle + scan-local
    * explode is the time claim. */
  private def runTsResample(s: SparkSession, dir: String): OpResult = {
    val raw = s.read.parquet(s"$dir/events.parquet")
    val ev = raw
      .select(col("user_id"),
        graft.sources.EventTs.asTimestamp(raw).as("ts"), col("value"))
      .repartition(s.sparkContext.defaultParallelism)
    var nSum = 0L
    var gapRows = 0L
    val r = timed {
      val out = graft.operators.TimeSeries
        .gapFillDaily(ev, "user_id", "ts", "value")
      val row = out.agg(count(lit(1)),
        coalesce(sum(col("n_events")), lit(0L)),
        coalesce(sum((col("n_events") === 0L).cast("long")), lit(0L)))
        .head()
      nSum = row.getLong(1)
      gapRows = row.getLong(2)
      row.getLong(0)
    }(Map.empty)
    r.copy(evidence = r.evidence ++ Map("n_sum" -> nSum,
      "gap_rows" -> gapRows))
  }

  /** Rolling window over the daily grain: copied users keep their
    * timestamps, so the active (key, day) frame and the total window
    * mass replicate exactly ×N. */
  private def runTsRolling(s: SparkSession, dir: String): OpResult = {
    val raw = s.read.parquet(s"$dir/events.parquet")
    val ev = raw
      .select(col("user_id"),
        graft.sources.EventTs.asTimestamp(raw).as("ts"), col("value"))
      .repartition(s.sparkContext.defaultParallelism)
    var mass = 0L
    val r = timed {
      val out = graft.operators.TimeSeries
        .rollingDaily(ev, "user_id", "ts", "value", 7)
      val row = out.agg(count(lit(1)),
        coalesce(sum(col("roll_events")), lit(0L))).head()
      mass = row.getLong(1)
      row.getLong(0)
    }(Map.empty)
    r.copy(evidence = r.evidence ++ Map("window_mass" -> mass))
  }

  /** Trailing-baseline anomalies: per-copy timelines are identical,
    * so the flag set replicates EXACTLY ×N — no flag appears or
    * disappears from seeing more users (baselines are per-key). */
  private def runTsAnomaly(s: SparkSession, dir: String): OpResult = {
    val raw = s.read.parquet(s"$dir/events.parquet")
    val ev = raw
      .select(col("user_id"),
        graft.sources.EventTs.asTimestamp(raw).as("ts"), col("value"))
      .repartition(s.sparkContext.defaultParallelism)
    timed {
      graft.operators.TimeSeries
        .anomalies(ev, "user_id", "ts", "value", 14, 2.0, 4)
        .count()
    }(Map.empty)
  }

  /** Markov transitions: the output domain is |event types|² —
    * CONSTANT as data scales — per-pair counts replicate exactly ×N,
    * and the probabilities are BIT-identical: p(×N) = (N·c)/(N·t)
    * rounds to the same double as c/t because N·c and N·t are exactly
    * representable, so both divisions round the same rational. The
    * p_hash equality across scales is therefore an exact gate. */
  private def runTransitions(s: SparkSession, dir: String): OpResult = {
    val raw = s.read.parquet(s"$dir/events.parquet")
    val ev = raw
      .select(col("user_id"), col("event_type"), col("event_id"),
        graft.sources.EventTs.asTimestamp(raw).as("ts"))
      .repartition(s.sparkContext.defaultParallelism)
    var nMass = 0L
    var pHash = 0L
    val r = timed {
      val out = graft.operators.Sequence
        .transitions(ev, "user_id", "event_type", "ts", "event_id")
      val row = out.agg(count(lit(1)),
        coalesce(sum(col("n")), lit(0L)),
        coalesce(sum(hash(col("prev_type"), col("next_type"),
          col("p")).cast("long")), lit(0L))).head()
      nMass = row.getLong(1)
      pHash = row.getLong(2)
      row.getLong(0)
    }(Map.empty)
    r.copy(evidence = r.evidence ++ Map("n_mass" -> nMass,
      "p_hash" -> pHash))
  }

  /** Last-touch attribution: copied users keep their timelines, so
    * attributed conversions replicate exactly ×N and the total
    * touch→conversion gap mass does too (same gaps, N times). */
  private def runAttribution(s: SparkSession, dir: String): OpResult = {
    val raw = s.read.parquet(s"$dir/events.parquet")
    val ev = raw
      .select(col("user_id"), col("event_type"), col("event_id"),
        graft.sources.EventTs.asTimestamp(raw).as("ts"))
      .repartition(s.sparkContext.defaultParallelism)
    var gapMass = 0L
    val r = timed {
      val out = graft.operators.Sequence
        .lastTouch(ev, "user_id", "event_type", "ts", "event_id",
          "click", "purchase")
        .where(col("touch_id").isNotNull)
        .select(expr("(unix_micros(conversion_ts) -" +
          " unix_micros(touch_ts)) div 1000000").as("gap_s"))
      val row = out.agg(count(lit(1)),
        coalesce(sum(col("gap_s")), lit(0L))).head()
      gapMass = row.getLong(1)
      row.getLong(0)
    }(Map.empty)
    r.copy(evidence = r.evidence ++ Map("gap_mass" -> gapMass))
  }

  /** Linear multi-touch attribution: copied users replay identical
    * journeys, so the (type, journey size, type count) histogram's KEY
    * SET is scale-invariant — same rows, journey counts ×N — which
    * pins both the journey assignment and the histogram cut. */
  private def runLinearCredit(s: SparkSession, dir: String): OpResult = {
    val raw = s.read.parquet(s"$dir/events.parquet")
    val ev = raw
      .select(col("user_id"), col("event_type"), col("event_id"),
        graft.sources.EventTs.asTimestamp(raw).as("ts"))
      .repartition(s.sparkContext.defaultParallelism)
    var jMass = 0L
    var keyHash = 0L
    val r = timed {
      val out = graft.operators.Sequence
        .linearCredit(ev, "user_id", "event_type", "ts", "event_id",
          Seq("view", "click"), "purchase")
      val row = out.agg(count(lit(1)),
        coalesce(sum(col("journeys")), lit(0L)),
        coalesce(sum(hash(col("touch_type"), col("n_touches"),
          col("c_type")).cast("long")), lit(0L))).head()
      jMass = row.getLong(1)
      keyHash = row.getLong(2)
      row.getLong(0)
    }(Map.empty)
    r.copy(evidence = r.evidence ++ Map("journey_mass" -> jMass,
      "key_hash" -> keyHash))
  }

  /** First-k paths: copies replay identical prefixes, so the path SET
    * (and its hash) is scale-invariant while the per-path key counts
    * carry all of ×N — the |types|^k-bounded output claim, measured. */
  private def runPaths(s: SparkSession, dir: String): OpResult = {
    val raw = s.read.parquet(s"$dir/events.parquet")
    val ev = raw
      .select(col("user_id"), col("event_type"), col("event_id"),
        graft.sources.EventTs.asTimestamp(raw).as("ts"))
      .repartition(s.sparkContext.defaultParallelism)
    var keyMass = 0L
    var pathHash = 0L
    val r = timed {
      val out = graft.operators.Sequence
        .topPaths(ev, "user_id", "event_type", "ts", "event_id", 5)
      val row = out.agg(count(lit(1)),
        coalesce(sum(col("n_keys")), lit(0L)),
        coalesce(sum(hash(col("path")).cast("long")), lit(0L))).head()
      keyMass = row.getLong(1)
      pathHash = row.getLong(2)
      row.getLong(0)
    }(Map.empty)
    r.copy(evidence = r.evidence ++ Map("key_mass" -> keyMass,
      "path_hash" -> pathHash))
  }

  /** Chunked sync checksum at ×N: the snapshot_diff drift replayed per
    * copy over chunk size 256 — which divides the 1e8 doc-id copy
    * offset, so every copy's damaged-chunk layout is identical and the
    * mismatch list replicates exactly ×N. Time is the md5-over-text
    * scan (linear CPU) plus a chunk-sized digest shuffle — rows never
    * move, which is the operator's whole point. */
  private def runSyncChecksum(s: SparkSession, dir: String): OpResult = {
    val base = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
      .repartition(s.sparkContext.defaultParallelism)
    val wid = pmod(col("doc_id"), lit(100000000L))
    val tgt = base.filter(pmod(wid, lit(11)) =!= 0)
      .withColumn("text", when(pmod(wid, lit(7)) === 0,
        concat(col("text"), lit(" drift"))).otherwise(col("text")))
      .unionByName(base.filter(pmod(wid, lit(13)) === 0)
        .select((col("doc_id") + lit(5000000000L)).as("doc_id"),
          col("lang"), col("text")))
    var nmMass = 0L; var nrMass = 0L
    val r = timed {
      val out = graft.operators.SyncCheck.mismatchedChunks(base, tgt,
        "doc_id", chunkSize = 256L,
        digestCols = Seq(col("doc_id"), col("lang"), col("text")))
      val row = out.agg(count(lit(1)),
        coalesce(sum(col("n_master")), lit(0L)),
        coalesce(sum(col("n_replica")), lit(0L))).head()
      nmMass = row.getLong(1); nrMass = row.getLong(2)
      row.getLong(0)
    }(Map.empty)
    r.copy(evidence = r.evidence ++ Map("n_master_mass" -> nmMass,
      "n_replica_mass" -> nrMass))
  }

  /** Bounded-state grouped top-k: output stays |groups|·k at every
    * scale, the kept ORD VALUES are scale-invariant (copies replicate
    * the value multiset; ids only break ties), and the executed plan
    * has no WindowExec — the shuffle carries ≤ k pairs per task-group
    * instead of every row through a per-group sort. */
  private def runTopkAgg(s: SparkSession, dir: String): OpResult = {
    val ev = s.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"), col("value"), col("event_id"))
      .repartition(s.sparkContext.defaultParallelism)
    var centsMass = 0L
    var windowNodes = 0L
    val r = timed {
      val q = ev.groupBy(col("event_type"))
        .agg(call_function("topk_pairs",
          (col("value").cast("decimal(12,2)") * 100).cast("long"),
          col("event_id"), lit(5)).as("top"))
        .select(col("event_type"), posexplode(col("top")))
        .select(col("event_type"), col("pos"), col("col.ord").as("cents"))
      // rank-1 values are scale-invariant (copies replicate the value
      // multiset, so the per-group MAX is unchanged); ranks 2..k shift
      // onto duplicated copies of the top values — counted, not summed
      val row = q.agg(count(lit(1)),
        coalesce(sum(when(col("pos") === 0, col("cents"))), lit(0L)))
        .head()
      windowNodes = q.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("Window")).toLong
      centsMass = row.getLong(1)
      row.getLong(0)
    }(Map.empty)
    r.copy(evidence = r.evidence ++ Map("top1_mass" -> centsMass,
      "window_nodes" -> windowNodes))
  }

  /** Grouped ntile: bucket count stays |groups|·k at every scale, the
    * executed plan must contain NO WindowExec (the operator's whole
    * point), and the ranked row count tracks the input. */
  private def runGroupedNtile(s: SparkSession, dir: String): OpResult = {
    val ev = s.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"), col("value"), col("event_id"))
      .repartition(s.sparkContext.defaultParallelism)
    var buckets = 0L
    var windowNodes = 0L
    val r = timed {
      val agg = graft.operators.GlobalRank
        .groupedNtile(ev, Seq("event_type"),
          Seq(col("value"), col("event_id")), 10)
        .groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("c"))
      windowNodes =
        if (agg.queryExecution.executedPlan.toString.contains("Window"))
          1L else 0L
      val row = agg.agg(count(lit(1)),
        coalesce(sum(col("c")), lit(0L))).head()
      buckets = row.getLong(0)
      row.getLong(1) // ranked rows = input rows
    }(Map.empty)
    r.copy(evidence = r.evidence ++ Map("buckets" -> buckets,
      "window_nodes" -> windowNodes))
  }

  /** Incremental aggregate-view maintenance against a ×1 vs ×N key
    * state: a FIXED 64-key probe batch must cost the same against both
    * — the touched group set is identical (copy-0 keys), the view's
    * group-row count is corpus-size-invariant, and the maintained
    * count mass proves the ×N state is actually in the view. Buckets
    * scale with the data (64·scale), the at-scale layout, so per-
    * bucket volume — hence probe cost — is flat. */
  private def runAggView(s: SparkSession, dir: String,
      scale: Int): OpResult = {
    val work = newTempDir("graft_scale_aggview_")
    val nBuckets = 64 * scale
    val spec = streaming.AggView.Spec(Seq("k"), Seq("g"), Seq("m"))
    val seed = s.read.parquet(s"$dir/events.parquet")
      .select(col("event_id").as("k"), col("event_type").as("g"),
        round(col("value") * 100).cast("long").as("m"),
        lit("I").as("_op"), lit(1L).as("_seq"))
    streaming.AggView.applyBatch(seed, 0L, s"$work/state", s"$work/view",
      spec, nBuckets, 8)
    val stateRows = seed.count()
    val probeKeys = seed.select(col("k")).orderBy(col("k")).limit(64)
      .collect().map(_.getLong(0)).toSeq
    val probe = seed
      .filter(col("k").isin(probeKeys.map(Long.box): _*))
      .select(col("k"), col("g"), (col("m") + 100000L).as("m"),
        lit("U").as("_op"), lit(2L).as("_seq"))
      .coalesce(1).localCheckpoint(eager = true)
    val r = timed {
      streaming.AggView.applyBatch(probe, 1L, s"$work/state",
        s"$work/view", spec, nBuckets, 8)
      0L
    }(Map.empty)
    val view = streaming.AggView.currentView(s, s"$work/view",
      seed.schema, spec, 8)
    val vRow = view.agg(count(lit(1)), coalesce(sum(col("cnt")), lit(0L)))
      .head()
    // what the probe's delta fold had to touch: group-buckets holding a
    // v=1 version
    val touchedView = (0 until 8).count { b =>
      new java.io.File(s"$work/view/bucket=$b/v=1").exists()
    }
    probe.unpersist()
    OpResult(r.secs, Map("out_rows" -> vRow.getLong(0),
      "view_cnt_sum" -> vRow.getLong(1), "state_rows" -> stateRows,
      "batch_keys" -> probeKeys.size.toLong,
      "touched_view_buckets" -> touchedView.toLong))
  }

  /** Min/max view maintenance against a ×1 vs ×N store: a FIXED
    * 64-key update batch recomputes ONLY its touched groups from
    * their group-bucketed projection buckets. Groups are
    * `event_id div 64`, so blow-up copies (disjoint id ranges) form
    * NEW groups of the same size — group membership is
    * corpus-invariant and the probe's recompute reads the same ~2
    * groups' rows at every scale: emitted view rows and their min/max
    * mass must be IDENTICAL at ×1 and ×N, proj buckets touched stay
    * bounded by the probe's group spread, and wall time stays flat
    * while state_rows grows exactly ×N. */
  private def runMinMaxView(s: SparkSession, dir: String,
      scale: Int): OpResult = {
    val work = newTempDir("graft_scale_minmax_")
    val stateBuckets = 64 * scale
    val projBuckets = 64 * scale
    val viewBuckets = 16 * scale
    val spec = streaming.MinMaxView.Spec(Seq("k"), Seq("g"), Seq("v"))
    val seed = s.read.parquet(s"$dir/events.parquet")
      .select(col("event_id").as("k"), (col("event_id") / 64)
        .cast("long").as("g"),
        round(col("value") * 100).cast("long").as("v"),
        lit("I").as("_op"), lit(1L).as("_seq"))
    streaming.MinMaxView.applyBatch(seed, 0L, s"$work/state",
      s"$work/proj", s"$work/view", spec, stateBuckets, projBuckets,
      viewBuckets)
    val stateRows = seed.count()
    val probeKeys = seed.select(col("k")).orderBy(col("k")).limit(64)
      .collect().map(_.getLong(0)).toSeq
    val probe = seed
      .filter(col("k").isin(probeKeys.map(Long.box): _*))
      .select(col("k"), col("g"), (col("v") + 100000L).as("v"),
        lit("U").as("_op"), lit(2L).as("_seq"))
      .coalesce(1).localCheckpoint(eager = true)
    val probeGroups = probe.select(col("g")).distinct().count()
    val r = timed {
      streaming.MinMaxView.applyBatch(probe, 1L, s"$work/state",
        s"$work/proj", s"$work/view", spec, stateBuckets, projBuckets,
        viewBuckets)
      0L
    }(Map.empty)
    // the recomputed view rows of the probe's groups: identical at
    // every scale (same groups, same membership, same +100000 bump)
    val touched = probe.select(col("g")).distinct()
    val view = streaming.MinMaxView.currentView(s, s"$work/view",
      seed.schema, spec, viewBuckets)
      .join(touched, Seq("g"), "left_semi")
    val vRow = view.agg(count(lit(1)),
      coalesce(sum(col("min_v") + col("max_v")), lit(0L))).head()
    val touchedProj = (0 until projBuckets).count { b =>
      new java.io.File(s"$work/proj/bucket=$b/v=1").exists()
    }
    probe.unpersist()
    OpResult(r.secs, Map("out_rows" -> vRow.getLong(0),
      "minmax_sum" -> vRow.getLong(1), "state_rows" -> stateRows,
      "batch_keys" -> probeKeys.size.toLong,
      "probe_groups" -> probeGroups,
      "touched_proj_buckets" -> touchedProj.toLong))
  }

  /** Exact distinct-count view maintenance against a ×1 vs ×N store —
    * the distinctCols generalization of [[runMinMaxView]] on the same
    * projection machinery: groups are `event_id div 64` (copies form
    * NEW groups of identical membership), so the fixed 64-key probe's
    * recomputed view rows and their uniq mass must be IDENTICAL at ×1
    * and ×N while state_rows grows exactly ×N and the recompute stays
    * confined to the probe's group spread in projection buckets. */
  private def runDistinctView(s: SparkSession, dir: String,
      scale: Int): OpResult = {
    val work = newTempDir("graft_scale_dview_")
    val stateBuckets = 64 * scale
    val projBuckets = 64 * scale
    val viewBuckets = 16 * scale
    val spec = streaming.MinMaxView.Spec(Seq("k"), Seq("g"),
      valueCols = Nil, distinctCols = Seq("v"))
    val seed = s.read.parquet(s"$dir/events.parquet")
      .select(col("event_id").as("k"), (col("event_id") / 64)
        .cast("long").as("g"),
        // value = id mod 7: every full group holds the same 7 distinct
        // values at every scale, and the probe's +7000 bump moves its
        // keys into fresh values deterministically
        (col("event_id") % 7).cast("long").as("v"),
        lit("I").as("_op"), lit(1L).as("_seq"))
    streaming.MinMaxView.applyBatch(seed, 0L, s"$work/state",
      s"$work/proj", s"$work/view", spec, stateBuckets, projBuckets,
      viewBuckets)
    val stateRows = seed.count()
    val probeKeys = seed.select(col("k")).orderBy(col("k")).limit(64)
      .collect().map(_.getLong(0)).toSeq
    val probe = seed
      .filter(col("k").isin(probeKeys.map(Long.box): _*))
      .select(col("k"), col("g"), (col("v") + 7000L).as("v"),
        lit("U").as("_op"), lit(2L).as("_seq"))
      .coalesce(1).localCheckpoint(eager = true)
    val probeGroups = probe.select(col("g")).distinct().count()
    val r = timed {
      streaming.MinMaxView.applyBatch(probe, 1L, s"$work/state",
        s"$work/proj", s"$work/view", spec, stateBuckets, projBuckets,
        viewBuckets)
      0L
    }(Map.empty)
    val touched = probe.select(col("g")).distinct()
    val view = streaming.MinMaxView.currentView(s, s"$work/view",
      seed.schema, spec, viewBuckets)
      .join(touched, Seq("g"), "left_semi")
    val vRow = view.agg(count(lit(1)),
      coalesce(sum(col("n_live") + col("uniq_v")), lit(0L))).head()
    val touchedProj = (0 until projBuckets).count { b =>
      new java.io.File(s"$work/proj/bucket=$b/v=1").exists()
    }
    probe.unpersist()
    OpResult(r.secs, Map("out_rows" -> vRow.getLong(0),
      "uniq_sum" -> vRow.getLong(1), "state_rows" -> stateRows,
      "batch_keys" -> probeKeys.size.toLong,
      "probe_groups" -> probeGroups,
      "touched_proj_buckets" -> touchedProj.toLong))
  }

  /** Streaming SCD2 maintenance against a ×1 vs ×N history: a FIXED
    * 64-key update batch reads, re-links and rewrites only its own
    * keys' histories (bucket-pruned; buckets ∝ data so bucket volume
    * is flat) — probe cost must not depend on history size. */
  private def runStreamScd(s: SparkSession, dir: String,
      scale: Int): OpResult = {
    val work = newTempDir("graft_scale_sscd_")
    val nBuckets = 64 * scale
    val seed = s.read.parquet(s"$dir/events.parquet")
      .select(col("event_id").as("k"), col("value").as("v"),
        lit("I").as("_op"), lit(1L).as("_seq"))
    streaming.StreamScd.applyBatch(seed, 0L, s"$work/hist", Seq("k"),
      nBuckets)
    val stateRows = seed.count()
    val probeKeys = seed.select(col("k")).orderBy(col("k")).limit(64)
      .collect().map(_.getLong(0)).toSeq
    val probe = seed
      .filter(col("k").isin(probeKeys.map(Long.box): _*))
      .select(col("k"), (col("v") + 1000000.0).as("v"),
        lit("U").as("_op"), lit(2L).as("_seq"))
      .coalesce(1).localCheckpoint(eager = true)
    val r = timed {
      streaming.StreamScd.applyBatch(probe, 1L, s"$work/hist", Seq("k"),
        nBuckets)
      0L
    }(Map.empty)
    // the probe keys' histories must now hold exactly two versions each,
    // correctly linked (old row closed at the update's seq)
    val hist = streaming.StreamScd.currentHistory(s, s"$work/hist",
      seed.schema, Seq("k"), nBuckets)
      .filter(col("k").isin(probeKeys.map(Long.box): _*))
    val hRow = hist.agg(count(lit(1)),
      coalesce(sum((col("valid_to") === 2L).cast("long")), lit(0L)),
      coalesce(sum(col("is_current")), lit(0L))).head()
    probe.unpersist()
    OpResult(r.secs, Map("out_rows" -> hRow.getLong(0),
      "closed_rows" -> hRow.getLong(1), "current_rows" -> hRow.getLong(2),
      "state_rows" -> stateRows,
      "batch_keys" -> probeKeys.size.toLong))
  }

  /** CDC-maintained dedup index at ×N: seed the full corpus (untimed),
    * then push a FIXED 64-doc probe batch (32 edits + 32 deletes, the
    * id-smallest docs of copy 0 — identical at both scales). Buckets
    * scale with the data, so per-bucket volume is flat and the probe's
    * band/sig/pair lookups read the same number of rows at ×1 and ×N;
    * probe-doc pairs stay within copy 0 (other copies are ROT'd), so
    * the post-probe pair counts are scale-invariant evidence. */
  private def runCdcDedup(s: SparkSession, dir: String,
      scale: Int): OpResult = {
    val work = newTempDir("graft_scale_cdcd_")
    val cfg = streaming.DedupIndex.Config(sigBuckets = 16 * scale,
      bandBuckets = 32 * scale, pairBuckets = 16 * scale)
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .repartition(s.sparkContext.defaultParallelism)
    streaming.DedupIndex.applyBatch(
      docs.select(lit("I").as("_op"), (col("doc_id") * 10).as("_seq"),
        col("doc_id"), col("text")),
      work, 0L, cfg)
    val stateRows = docs.count()
    val probeIds = docs.filter(col("doc_id") < 100000000L)
      .select(col("doc_id")).orderBy(col("doc_id")).limit(64)
      .collect().map(_.getLong(0)).toSeq
    val updIds = probeIds.filter(_ % 2 == 0)
    val delIds = probeIds.filter(_ % 2 == 1)
    val probe = docs
      .filter(col("doc_id").isin(updIds.map(Long.box): _*))
      .select(lit("U").as("_op"), (col("doc_id") * 10 + 1).as("_seq"),
        col("doc_id"),
        concat(col("text"), lit(" graft edit marker")).as("text"))
      .unionByName(docs
        .filter(col("doc_id").isin(delIds.map(Long.box): _*))
        .select(lit("D").as("_op"), (col("doc_id") * 10 + 1).as("_seq"),
          col("doc_id"), lit(null).cast("string").as("text")))
      .coalesce(1).localCheckpoint(eager = true)
    val r = timed {
      streaming.DedupIndex.applyBatch(probe, work, 1L, cfg)
      0L
    }(Map.empty)
    val pairs = streaming.DedupIndex.currentPairs(s, work, cfg)
    val updPairs = pairs.filter(
      col("a").isin(updIds.map(Long.box): _*) ||
        col("b").isin(updIds.map(Long.box): _*)).count()
    val delPairs = pairs.filter(
      col("a").isin(delIds.map(Long.box): _*) ||
        col("b").isin(delIds.map(Long.box): _*)).count()
    probe.unpersist()
    OpResult(r.secs, Map("out_rows" -> updPairs,
      "del_pairs" -> delPairs, "state_rows" -> stateRows,
      "batch_keys" -> probeIds.size.toLong))
  }

  /** cdc_corpus_clean at scale: the maintained-corpus pipeline — the
    * full I/U/D feed advances the LWW doc state and the dedup index,
    * then the refresh tail (CC keep-one → LM filter → mixture →
    * packing → split) runs over the maintained states. Gated
    * invariants under the alphabet-rotation blow-up: the maintained
    * live-row count equals the feed's direct LWW arithmetic (an
    * internal-consistency identity, checked at BOTH scales), verified
    * cross-copy pairs are ZERO (rotation drives cross-copy jaccard to
    * 0 and the index verifies exactly), and CC rounds stay O(log n).
    * Banded recall and the per-copy LM retrain are fresh hash draws
    * per rotated copy, so pair/kept/out-row counts ride as reported
    * evidence — the wall-clock exponent carries the cost claim. */
  private def runCdcCorpusClean(s: SparkSession, dir: String,
      scale: Int): OpResult = {
    import graft.functions.TextFunctions
    import graft.operators.{Clustering, LangModel, Packing, Sampling}
    val work = newTempDir("graft_scale_cdccc_")
    val cfg = streaming.DedupIndex.Config(sigBuckets = 8 * scale,
      bandBuckets = 16 * scale, pairBuckets = 8 * scale)
    val stateBuckets = 8 * scale
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
      .repartition(s.sparkContext.defaultParallelism)
      .localCheckpoint(true)
    val b0 = docs.select(lit("I").as("_op"),
      (col("doc_id") * 10).as("_seq"), col("doc_id"), col("lang"),
      col("text"))
    val b1 = docs.filter(col("doc_id") % 5 === 0)
      .select(lit("U").as("_op"), (col("doc_id") * 10 + 1).as("_seq"),
        col("doc_id"), col("lang"),
        concat(col("text"), lit(" graft edit marker graft edit marker"))
          .as("text"))
    val b2 = docs.filter(col("doc_id") % 17 === 0)
      .select(lit("D").as("_op"), (col("doc_id") * 10 + 2).as("_seq"),
        col("doc_id"), lit(null).cast("string").as("lang"),
        lit(null).cast("string").as("text"))
    val changeSchema = b0.schema
    val r = timed {
      Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
        // doc-state merge concurrent with the index batch — mirrors
        // the shipped query (SparkEntry.cdcCorpusClean)
        val stateCommit = scala.concurrent.Future {
          streaming.BucketedState.mergeBatch(b, i.toLong, s"$work/state",
            Seq("doc_id"), stateBuckets)
        }(scala.concurrent.ExecutionContext.global)
        try streaming.DedupIndex.applyBatch(b, s"$work/dedup", i.toLong,
          cfg)
        catch { case t: Throwable =>
          try scala.concurrent.Await.ready(stateCommit,
            scala.concurrent.duration.Duration.Inf)
          catch { case _: Throwable => () }
          throw t
        }
        scala.concurrent.Await.result(stateCommit,
          scala.concurrent.duration.Duration.Inf)
      }
      val live = streaming.BucketedState.currentView(s, s"$work/state",
          changeSchema, stateBuckets)
        .select("doc_id", "lang", "text").localCheckpoint(true)
      val pairs = streaming.DedupIndex.currentPairs(s, s"$work/dedup",
        cfg).select("a", "b")
      val kept = Clustering.canonicalize(live.select("doc_id"), pairs,
        "doc_id").filter(col("keep")).select("doc_id")
      val clean = live.join(kept, Seq("doc_id")).localCheckpoint(true)
      val good = LangModel.score(
        clean.select("doc_id", "text")
          .repartition(s.sparkContext.defaultParallelism),
        "doc_id", "text")
        .filter(col("lm_score") >= -3.40).select("doc_id")
      val mixed = Sampling.temperatureSampleByHash(
        clean.join(good, Seq("doc_id")).select("doc_id", "lang"),
        "doc_id", "lang", alpha = 0.5, targetFrac = 0.3)
      val toks = clean.join(mixed.select("doc_id"), Seq("doc_id"))
        .select(col("doc_id"),
          TextFunctions.bpeTokenCount(col("text")).cast("long")
            .as("n_tok"))
      val packed = Packing.packByBudget(toks, "doc_id", "n_tok",
        budget = 2048L)
      Sampling.hashSplit(packed, "doc_id",
          Seq("train" -> 8, "eval" -> 1, "test" -> 1)).count()
    } {
      val live = streaming.BucketedState.currentView(s, s"$work/state",
          changeSchema, stateBuckets)
      val pairs = streaming.DedupIndex.currentPairs(s, s"$work/dedup",
        cfg)
      Map(
        "live_rows" -> live.count(),
        "expected_live" -> docs.filter(col("doc_id") % 17 =!= 0).count(),
        "pairs" -> pairs.count(),
        // copy index = id / 1e8 (blowUpDocuments' disjoint ranges)
        "cross_pairs" -> pairs.filter(
          col("a").divide(lit(100000000L)).cast("long") =!=
            col("b").divide(lit(100000000L)).cast("long")).count(),
        "cc_rounds" -> Clustering.lastStats.rounds.toLong)
    }
    docs.unpersist()
    r
  }

  /** Incremental IVF maintenance against a ×1 vs ×N index: a FIXED
    * 64-vector re-embed batch must cost the same against both (key
    * buckets ∝ data, so bucket volume is flat; assignment is a
    * scan-local broadcast argmax). The frozen quantizer trains on the
    * 2048 id-smallest vectors — copy 0 at every scale, so both indexes
    * share identical centroids and the probe's post-update list
    * assignments are scale-invariant evidence. */
  private def runVecIndex(s: SparkSession, dir: String,
      scale: Int): OpResult = {
    val work = newTempDir("graft_scale_vecidx_")
    // trainSample within copy 0 (the base corpus holds 2000 vectors):
    // both scales train on identical vectors → identical centroids
    val conf = streaming.VectorIndex.Conf(stateBuckets = 64 * scale,
      trainSample = 1024)
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    streaming.VectorIndex.bootstrap(emb, work, conf)
    val stateRows = emb.count()
    val probeKeys = emb.select(col("vec_id")).orderBy(col("vec_id"))
      .limit(64).collect().map(_.getLong(0)).toSeq
    val vecType = emb.schema("embedding").dataType
    val probe = emb
      .filter(col("vec_id").isin(probeKeys.map(Long.box): _*))
      .select(col("vec_id"),
        transform(col("embedding"), x => -x).cast(vecType)
          .as("embedding"),
        lit("U").as("_op"), lit(1L).as("_seq"))
      .coalesce(1).localCheckpoint(eager = true)
    val r = timed {
      streaming.VectorIndex.applyBatch(probe, 0L, work, conf)
      0L
    }(Map.empty)
    val schema = probe.schema
    val view = streaming.VectorIndex.indexedView(s, work, schema, conf)
      .filter(col("neighbor_id").isin(probeKeys.map(Long.box): _*))
    // post-update assignment census of the probe keys — identical
    // centroids + identical probe vectors ⇒ identical at every scale
    val vRow = view.agg(count(lit(1)),
      coalesce(sum(col("bucket")), lit(0L))).head()
    probe.unpersist()
    OpResult(r.secs, Map("out_rows" -> vRow.getLong(0),
      "list_sum" -> vRow.getLong(1), "state_rows" -> stateRows,
      "batch_keys" -> probeKeys.size.toLong))
  }

  /** Data-file count of the sigs+bands store dirs. */
  private def storeFiles(store: String): Long = {
    import scala.jdk.CollectionConverters._
    Seq("sigs", "bands").map { n =>
      val p = Paths.get(store, n)
      if (!Files.exists(p)) 0L
      else Files.walk(p).iterator().asScala
        .count(f => f.toString.endsWith(".parquet")).toLong
    }.sum
  }

  // ------------------------------------------------------------------ main

  // ---- round-11 operators ------------------------------------------

  /** Base (pre-offset) event id — copy offsets are 10¹⁰ multiples, so
    * pmod recovers the base id and modulo-derived mutation patterns
    * replicate identically per copy while keys stay disjoint. */
  private def baseEid(c: Column): Column = pmod(c, lit(10000000000L))

  /** CollapsingMergeTree FINAL over a per-copy-identical sign stream:
    * survivors and their cents mass must replicate exactly ×N (one
    * key-partitioned exchange, nothing cross-copy). */
  private def runChCollapse(s: SparkSession, dir: String): OpResult = {
    val ev = s.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("value"))
    val base = baseEid(col("event_id"))
    val st1 = ev.select(col("event_id").as("k"), col("value").as("v"),
      lit(1).as("sign"), lit(1L).as("seq"))
    val upd = ev.filter(base % 3 === 0)
    val can = upd.select(col("event_id").as("k"), col("value").as("v"),
      lit(-1).as("sign"), lit(2L).as("seq"))
    val st2 = upd.select(col("event_id").as("k"),
      (col("value") + lit(1.0)).as("v"), lit(1).as("sign"),
      lit(3L).as("seq"))
    val del = ev.filter(base % 7 === 0)
      .select(col("event_id").as("k"),
        when(base % 3 === 0, col("value") + lit(1.0))
          .otherwise(col("value")).as("v"),
        lit(-1).as("sign"), lit(4L).as("seq"))
    val feed = st1.unionByName(can).unionByName(st2).unionByName(del)
    var mass = 0L
    timed {
      val agg = graft.operators.Collapse
        .collapse(feed, Seq("k"), "sign", "seq")
        .agg(count(lit(1)),
          sum(round(col("v") * 100).cast("long"))).head()
      mass = agg.getLong(1)
      agg.getLong(0)
    }(Map("cents_mass" -> mass))
  }

  /** TTL GROUP BY rewrite: the rolled grain (day × type) is shared by
    * every copy, so rolled group count is scale-INVARIANT while its
    * row mass and the live tail carry all of ×N. */
  private def runTtlExpire(s: SparkSession, dir: String): OpResult = {
    val ev = s.read.parquet(s"$dir/events.parquet")
    var rolledGroups = 0L
    var nMass = 0L
    var liveRows = 0L
    timed {
      val out = graft.operators.Ttl.rollupExpired(ev, "ts",
        lit("2024-01-22 00:00:00").cast("timestamp"),
        keys = Seq("day" -> col("ts").cast("date").cast("string"),
          "event_type" -> col("event_type")),
        aggs = Seq(("n", count(lit(1)), lit(1L)),
          ("vmax", max(col("value")), col("value"))),
        liveCols = Seq("event_id" -> col("event_id")))
      val agg = out.agg(count(lit(1)),
        sum(when(col("rolled"), lit(1L)).otherwise(lit(0L))),
        sum(col("n")),
        sum(when(!col("rolled"), lit(1L)).otherwise(lit(0L)))).head()
      rolledGroups = agg.getLong(1)
      nMass = agg.getLong(2)
      liveRows = agg.getLong(3)
      agg.getLong(0)
    }(Map("rolled_groups" -> rolledGroups, "n_mass" -> nMass,
      "live_rows" -> liveRows))
  }

  /** LowCardinality dictionary: the code table is alphabet-sized at
    * ANY corpus size; counts carry ×N and the frequency order (hence
    * the code assignment) is preserved under uniform scaling. */
  private def runDictEncode(s: SparkSession, dir: String): OpResult = {
    val ev = s.read.parquet(s"$dir/events.parquet")
    var nMass = 0L
    var codeHash = 0L
    timed {
      val d = graft.operators.Dict.build(ev, "event_type")
      val agg = d.agg(count(lit(1)), sum(col("n")),
        sum(col("code") * pmod(xxhash64(col("value")),
          lit(1000000007L)))).head()
      nMass = agg.getLong(1)
      codeHash = agg.getLong(2)
      agg.getLong(0)
    }(Map("n_mass" -> nMass, "code_hash" -> codeHash))
  }

  /** K-means ASSIGNMENT (the scan-dominant phase) with centroids
    * frozen from copy 0: map-only — the executed plan must contain
    * ZERO exchanges — with copy-0 assignments identical at both
    * scales (sign-flipped copies add rows, never disturb copy 0). */
  private def runKmeansAssign(s: SparkSession, dir: String): OpResult = {
    import graft.operators.Kmeans
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val q = emb.select(col("vec_id"),
      Kmeans.quantize(col("embedding")).as("q"))
    val centroids = q.filter(col("vec_id") < 8).orderBy(col("vec_id"))
      .collect().zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Long](1).toSeq }.toSeq
    var copy0Mass = 0L
    var exchanges = 0L
    timed {
      val assigned = Kmeans.assign(q, "q", centroids)
      exchanges = "Exchange".r
        .findAllIn(assigned.queryExecution.executedPlan.toString)
        .size.toLong
      val agg = assigned.agg(count(lit(1)),
        sum(when(col("vec_id") < 100000000L,
          (col("cid") + 1) * (col("vec_id") + 1)).otherwise(lit(0L))))
        .head()
      copy0Mass = agg.getLong(1)
      agg.getLong(0)
    }(Map("copy0_mass" -> copy0Mass, "exchange_nodes" -> exchanges))
  }

  /** Bloom runtime filter: the build side is pinned to copy-0 keys, so
    * join output is scale-INVARIANT while the probe grows ×N; the
    * bloom must keep the shuffled volume near the true match count
    * (false positives bounded by the sized mask). */
  private def runJoinBloom(s: SparkSession, dir: String): OpResult = {
    val ev = s.read.parquet(s"$dir/events.parquet")
    val build = ev.filter(col("user_id") < 100000000L &&
        col("user_id") % 97 === 0)
      .select(col("user_id").as("bk")).distinct()
    var kept = 0L
    var total = 0L
    timed {
      val bloom = graft.operators.RuntimeFilter
        .keyBloom(build, "bk", 1 << 16)
      total = ev.count()
      kept = ev.filter(bloom(col("user_id"))).count()
      ev.filter(bloom(col("user_id")))
        .join(build, col("user_id") === col("bk"))
        .count()
    }(Map("bloom_kept" -> kept, "probe_rows" -> total))
  }

  /** Synthetic per-copy triangle motif over blown-up doc ids: one
    * triangle per 10 base docs plus a per-copy hub star (skew probe).
    * Triangles and their vertex mass replicate exactly ×N; the star
    * adds zero triangles at every scale. */
  private def runTriangles(s: SparkSession, dir: String): OpResult = {
    val ids = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"))
    val base = pmod(col("doc_id"), lit(100000000L))
    val copy = col("doc_id") - base
    val tri = ids.filter(base % 10 === 0)
      .select(explode(array(
        struct(col("doc_id").as("a"), (col("doc_id") + 1).as("b")),
        struct(col("doc_id").as("a"), (col("doc_id") + 2).as("b")),
        struct((col("doc_id") + 1).as("a"), (col("doc_id") + 2).as("b"))
      )).as("e")).select(col("e.a").as("a"), col("e.b").as("b"))
    val star = ids.filter(base % 13 === 0)
      .select(copy.as("a"), (col("doc_id") + 5).as("b"))
    val edges = tri.unionByName(star)
    var vertexMass = 0L
    timed {
      val t = graft.operators.Graph.triangles(edges)
      // mass over BASE ids so per-copy contributions are identical
      val agg = t.agg(count(lit(1)),
        sum(pmod(pmod(col("x"), lit(100000000L)) +
          pmod(col("y"), lit(100000000L)) +
          pmod(col("z"), lit(100000000L)), lit(1000000007L))))
        .head()
      vertexMass = agg.getLong(1)
      agg.getLong(0)
    }(Map("vertex_mass" -> vertexMass))
  }

  /** Integer EWMA: per-copy series are identical, so the fold output
    * (rows AND total smoothed mass) replicates exactly ×N. */
  private def runTsEwma(s: SparkSession, dir: String): OpResult = {
    val ev = s.read.parquet(s"$dir/events.parquet")
    var ewmaMass = 0L
    timed {
      val out = graft.operators.TimeSeries
        .ewmaHalvingDaily(ev, "user_id", "ts", "value")
      val agg = out.agg(count(lit(1)), sum(col("ewma"))).head()
      ewmaMass = agg.getLong(1)
      agg.getLong(0)
    }(Map("ewma_mass" -> ewmaMass))
  }

  /** Integer CUSUM: same per-copy-identical series argument as the
    * EWMA — fold rows, drift mass, and alarm count replicate ×N. */
  private def runTsCusum(s: SparkSession, dir: String): OpResult = {
    val ev = s.read.parquet(s"$dir/events.parquet")
    var driftMass = 0L
    var alarms = 0L
    timed {
      val out = graft.operators.TimeSeries
        .cusumDaily(ev, "user_id", "ts", "value")
      val agg = out.agg(count(lit(1)), sum(col("cusum")),
        sum(col("alarm").cast("long"))).head()
      driftMass = agg.getLong(1)
      alarms = agg.getLong(2)
      agg.getLong(0)
    }(Map("drift_mass" -> driftMass, "alarms" -> alarms))
  }

  /** windowFunnel: copies carry identical timelines under fresh user
    * ids, so the depth histogram keys are stable and every count
    * carries exactly ×N. */
  private def runWindowFunnel(s: SparkSession, dir: String): OpResult = {
    val ev = s.read.parquet(s"$dir/events.parquet")
    var groupMass = 0L
    timed {
      val out = graft.operators.Funnel.windowed(ev, "user_id",
        "event_type", "ts", Seq("view", "click", "purchase"),
        expr("INTERVAL 60 MINUTES"))
      val agg = out.agg(count(lit(1)), sum(col("n_groups"))).head()
      groupMass = agg.getLong(1)
      agg.getLong(0)
    }(Map("group_mass" -> groupMass))
  }

  /** Holt level+trend: same per-copy-identical series argument as the
    * EWMA — fold rows, level mass and trend mass replicate ×N. */
  private def runTsHolt(s: SparkSession, dir: String): OpResult = {
    val ev = s.read.parquet(s"$dir/events.parquet")
    var levelMass = 0L
    var trendMass = 0L
    timed {
      val out = graft.operators.TimeSeries
        .holtHalvingDaily(ev, "user_id", "ts", "value")
      val agg = out.agg(count(lit(1)), sum(col("level")),
        sum(col("trend"))).head()
      levelMass = agg.getLong(1)
      trendMass = agg.getLong(2)
      agg.getLong(0)
    }(Map("level_mass" -> levelMass, "trend_mass" -> trendMass))
  }

  /** SummingMergeTree fold: per-copy-identical measures (cents as
    * exact longs) with %3 adjustments and %13 full negations on the
    * BASE id — survivors, their count mass, and cents mass all ×N,
    * and the negated keys vanish in every copy. */
  private def runChSumming(s: SparkSession, dir: String): OpResult = {
    val ev = s.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("value"))
    val base = baseEid(col("event_id"))
    val cents = round(col("value") * 100).cast("long")
    val b = ev.select(col("event_id").as("k"), lit(1L).as("cnt"),
      cents.as("c"))
    val adj = ev.filter(base % 3 === 0)
      .select(col("event_id").as("k"), lit(1L).as("cnt"),
        lit(1000L).as("c"))
    val neg = ev.filter(base % 13 === 0)
      .select(col("event_id").as("k"),
        when(base % 3 === 0, lit(-2L)).otherwise(lit(-1L)).as("cnt"),
        (-(cents + when(base % 3 === 0, lit(1000L)).otherwise(lit(0L))))
          .as("c"))
    val feed = b.unionByName(adj).unionByName(neg)
    var cntMass = 0L
    var centsMass = 0L
    timed {
      val agg = graft.operators.Collapse
        .summing(feed, Seq("k"), Seq("cnt", "c"), Seq.empty)
        .agg(count(lit(1)), sum(col("cnt")), sum(col("c"))).head()
      cntMass = agg.getLong(1)
      centsMass = agg.getLong(2)
      agg.getLong(0)
    }(Map("cnt_mass" -> cntMass, "cents_mass" -> centsMass))
  }

  /** sequenceMatch: copies carry identical timelines under fresh user
    * ids, so the match-count histogram keys are stable and every
    * per-key count carries exactly ×N. */
  private def runSeqMatch(s: SparkSession, dir: String): OpResult = {
    val ev = s.read.parquet(s"$dir/events.parquet")
    var keyMass = 0L
    var matchMass = 0L
    timed {
      val out = graft.operators.Sequence.seqMatch(ev, "user_id",
        "event_type", "ts", "event_id",
        Seq("view", "click", "purchase"),
        Seq(expr("INTERVAL 120 MINUTES"), expr("INTERVAL 240 MINUTES")))
      val agg = out.agg(count(lit(1)), sum(col("n_keys")),
        sum(col("n_matches") * col("n_keys"))).head()
      keyMass = agg.getLong(1)
      matchMass = agg.getLong(2)
      agg.getLong(0)
    }(Map("key_mass" -> keyMass, "match_mass" -> matchMass))
  }

  /** sequenceNextNode: identical per-copy timelines under fresh user
    * ids — the next-type histogram keys are stable and every key
    * count carries exactly ×N. */
  private def runNextNode(s: SparkSession, dir: String): OpResult = {
    val ev = s.read.parquet(s"$dir/events.parquet")
    var keyMass = 0L
    timed {
      val out = graft.operators.Sequence.nextNode(ev, "user_id",
        "event_type", "ts", "event_id", Seq("view", "click"))
      val agg = out.agg(count(lit(1)), sum(col("n_keys"))).head()
      keyMass = agg.getLong(1)
      agg.getLong(0)
    }(Map("key_mass" -> keyMass))
  }

  /** Behavioral entropy: identical per-copy event mixes under fresh
    * user ids — contribution rows and exact count mass ×N while the
    * set of DISTINCT rounded contributions stays fixed (a float-free
    * equality on the 9-dp doubles). */
  private def runStatsEntropy(s: SparkSession, dir: String): OpResult = {
    val ev = s.read.parquet(s"$dir/events.parquet")
    var cMass = 0L
    var hKeys = 0L
    timed {
      val out = graft.operators.CorpusStats.groupEntropy(
        ev, "user_id", "event_type")
      val agg = out.agg(count(lit(1)), sum(col("c")),
        countDistinct(col("h_contrib"))).head()
      cMass = agg.getLong(1)
      hKeys = agg.getLong(2)
      agg.getLong(0)
    }(Map("c_mass" -> cMass, "h_keys" -> hKeys))
  }

  /** Skip index: the range predicate lives entirely in copy 0, so
    * result rows and surviving granules are scale-INVARIANT while the
    * granule universe grows with the corpus — the skip RATIO is what
    * improves at scale. */
  private def runIndexPrune(s: SparkSession, dir: String): OpResult = {
    import graft.operators.Layout
    val ev = s.read.parquet(s"$dir/events.parquet")
      .withColumn("day", dayofmonth(col("ts")))
      // cluster key: copy-separated user slot (base user ids < 2048;
      // each copy's slot range is disjoint), integer arithmetic only
      .withColumn("_blk", Layout.blockOf(
        Layout.zValue(pmod(col("user_id"), lit(2048L)) +
          expr("user_id div 100000000L") * lit(2048L),
          col("day"), 16), 12))
    var surviving = 0L
    var totalBlocks = 0L
    timed {
      val stats = Layout.minmaxStats(ev, "_blk", Seq("user_id", "day"))
      val surv = Layout.pruneBlocks(stats,
        Seq(("user_id", lit(100), lit(200)), ("day", lit(5), lit(10))))
      totalBlocks = stats.count()
      surviving = surv.count()
      Layout.prunedScan(ev, "_blk", surv)
        .filter(col("user_id").between(100, 200) &&
          col("day").between(5, 10))
        .count()
    }(Map("surviving_blocks" -> surviving,
      "total_blocks" -> totalBlocks))
  }

  /** Phrase search: the alphabet rotation relocates every copy's
    * tokens, so the hit set is confined to copy 0 — result rows and
    * hit mass are scale-invariant while the postings scan carries ×N. */
  private def runTextPhrase(s: SparkSession, dir: String): OpResult = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
    var hitMass = 0L
    timed {
      val out = graft.operators.Retrieval.phraseSearch(docs, "doc_id",
        "text", Seq("value", "table"))
      val agg = out.agg(count(lit(1)), sum(col("n_hits"))).head()
      hitMass = agg.getLong(1)
      agg.getLong(0)
    }(Map("hit_mass" -> hitMass))
  }

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
    // two measurements scan identically-laid-out parquet; the dirs are
    // sf-shaped so composed queries (corpus_clean) run against them
    // through the exact SparkEntry code path the gate runs
    val work = newTempDir("graft_scale_")
    try {
    val docs = spark.read.parquet(s"$base/documents.parquet")
    val ev = spark.read.parquet(s"$base/events.parquet")
    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    Seq(1 -> "x1", n -> "xN").foreach { case (m, d) =>
      blowUpDocuments(docs, m).write.parquet(s"$work/$d/documents.parquet")
      blowUpEvents(ev, m).write.parquet(s"$work/$d/events.parquet")
      blowUpEmbeddings(emb, m).write.parquet(s"$work/$d/embeddings.parquet")
    }

    // fixed incremental-dedup probe batch: copy 13 of the base corpus
    // (disjoint from blow-up copies 0..n-1 for every n ≤ 13)
    require(n <= 13, s"scale n=$n collides with the copy-13 probe batch")
    val incBatch = docCopy(docs, 13)
    val ops: Seq[(String, String => OpResult)] = Seq(
      "dedup_clusters" -> (d => runDedupClusters(spark, d)),
      "asof_join" -> (d => runAsof(spark, d, bucketed = false)),
      "asof_join_bucketed" -> (d => runAsof(spark, d, bucketed = true)),
      "range_join" -> (d => runRangeJoin(spark, d)),
      "pack_budget" -> (d => runPackBudget(spark, d)),
      "streaming_dedup" -> (d => runStreamingDedup(spark, d)),
      "stream_asof" -> (d => runStreamAsof(spark, d)),
      "corpus_clean" -> (d => runCorpusClean(spark, d)),
      "corpus_clean_v5" -> (d => runCorpusCleanV5(spark, d)),
      "corpus_clean_v6" -> (d => runCorpusCleanV6(spark, d)),
      "ann_lsh" -> (d => runAnn(spark, d, "lsh")),
      "ann_ivf" -> (d => runAnn(spark, d, "ivf")),
      "ann_quantized" -> (d => runAnn(spark, d, "quantized")),
      "decontam_ngram" -> (d => runDecontam(spark, d)),
      "decontam_bloom" -> (d => runDecontamBloom(spark, d,
        if (d.endsWith("x1")) 1 else n)),
      "curriculum_order" -> (d => runGlobalRank(spark, d)),
      "dedup_ngram" -> (d => runNgramJaccard(spark, d)),
      "corpus_shuffle" -> (d => runCorpusShuffle(spark, d)),
      "dedup_incremental" -> (d => runIncDedup(spark, d, incBatch)),
      "dedup_compact" -> (d => runCompact(spark, d, incBatch)),
      "text_lm_score" -> (d => runLmScore(spark, d)),
      "cdc_serve" -> (d => runCdcServe(spark, d,
        if (d.endsWith("x1")) 1 else n)),
      "dedup_spans" -> (d => runDedupSpans(spark, d)),
      "dedup_semantic" -> (d => runSemanticDedup(spark, d,
        if (d.endsWith("x1")) 1 else n)),
      "stats_quantiles" -> (d => runStatsQuantiles(spark, d)),
      "dedup_lines" -> (d => runDedupLines(spark, d)),
      "sketch_cms" -> (d => runCms(spark, d)),
      "sketch_hll" -> (d => runSketchHll(spark, d)),
      "quality_domain_filter" -> (d => runQualityDomainFilter(spark, d)),
      "dedup_containment" -> (d => runContainment(spark, d)),
      "stream_sessions" -> (d => runStreamSessions(spark, d)),
      "dsir_score" -> (d => runDsir(spark, d)),
      "event_cooccur" -> (d => runCooccur(spark, d)),
      "graph_pagerank" -> (d => runPagerank(spark, d)),
      "coreset_kcenter" -> (d => runCoreset(spark, d)),
      "snapshot_diff" -> (d => runSnapshotDiff(spark, d)),
      "event_funnel" -> (d => runFunnel(spark, d)),
      "event_retention" -> (d => runRetention(spark, d)),
      "profile_table" -> (d => runProfile(spark, d)),
      "fuzzy_join" -> (d => runFuzzyJoin(spark, d)),
      "fuzzy_short" -> (d => runFuzzyShort(spark, d)),
      "ts_resample" -> (d => runTsResample(spark, d)),
      "ts_rolling" -> (d => runTsRolling(spark, d)),
      "ts_anomaly" -> (d => runTsAnomaly(spark, d)),
      "event_transitions" -> (d => runTransitions(spark, d)),
      "event_attribution" -> (d => runAttribution(spark, d)),
      "event_attribution_linear" -> (d => runLinearCredit(spark, d)),
      "event_paths" -> (d => runPaths(spark, d)),
      "sync_checksum" -> (d => runSyncChecksum(spark, d)),
      "q_ntile" -> (d => runGroupedNtile(spark, d)),
      "topk_grouped_agg" -> (d => runTopkAgg(spark, d)),
      "agg_view" -> (d => runAggView(spark, d,
        if (d.endsWith("x1")) 1 else n)),
      "minmax_view" -> (d => runMinMaxView(spark, d,
        if (d.endsWith("x1")) 1 else n)),
      "distinct_view" -> (d => runDistinctView(spark, d,
        if (d.endsWith("x1")) 1 else n)),
      "stream_scd2" -> (d => runStreamScd(spark, d,
        if (d.endsWith("x1")) 1 else n)),
      "ann_incremental" -> (d => runVecIndex(spark, d,
        if (d.endsWith("x1")) 1 else n)),
      "cdc_dedup" -> (d => runCdcDedup(spark, d,
        if (d.endsWith("x1")) 1 else n)),
      "cdc_corpus_clean" -> (d => runCdcCorpusClean(spark, d,
        if (d.endsWith("x1")) 1 else n)),
      "ch_collapse" -> (d => runChCollapse(spark, d)),
      "ttl_expire" -> (d => runTtlExpire(spark, d)),
      "dict_encode" -> (d => runDictEncode(spark, d)),
      "embed_kmeans" -> (d => runKmeansAssign(spark, d)),
      "join_bloom" -> (d => runJoinBloom(spark, d)),
      "graph_triangles" -> (d => runTriangles(spark, d)),
      "ts_ewma" -> (d => runTsEwma(spark, d)),
      "event_window_funnel" -> (d => runWindowFunnel(spark, d)),
      "index_prune" -> (d => runIndexPrune(spark, d)),
      "text_phrase" -> (d => runTextPhrase(spark, d)),
      "ts_cusum" -> (d => runTsCusum(spark, d)),
      "ch_summing" -> (d => runChSumming(spark, d)),
      "event_seq_match" -> (d => runSeqMatch(spark, d)),
      "event_next_node" -> (d => runNextNode(spark, d)),
      "stats_entropy" -> (d => runStatsEntropy(spark, d)),
      "ts_holt" -> (d => runTsHolt(spark, d)))
      .filter { case (name, _) =>
        // SPARK_GRAFT_SCALE_ONLY=a,b restricts the op set (iteration
        // aid, mirrors Bench's SPARK_GRAFT_ONLY); unset = all
        sys.env.get("SPARK_GRAFT_SCALE_ONLY")
          .map(_.split(",").map(_.trim).toSet)
          .forall(_.contains(name))
      }

    // warmup outside all timings
    spark.read.parquet(s"$work/x1/documents.parquet").count()
    spark.read.parquet(s"$work/x1/events.parquet").count()

    def measure(fn: String => OpResult, dir: String): OpResult = {
      // min-of-2: shared-host steal stalls are bursty; evidence values
      // are deterministic so either run's are valid
      val a = fn(dir)
      spark.catalog.clearCache()
      val b = fn(dir)
      spark.catalog.clearCache()
      OpResult(math.min(a.secs, b.secs), b.evidence)
    }

    val rows = ops.map { case (name, fn) =>
      val at1 = measure(fn, s"$work/x1")
      val atN = measure(fn, s"$work/xN")
      val ratio = atN.secs / math.max(at1.secs, 1e-9)
      val exponent = math.log(ratio) / math.log(n.toDouble)
      val structuralOk = name match {
        case "dedup_clusters" =>
          atN.evidence("cc_rounds") <= at1.evidence("cc_rounds") + 2 &&
            atN.evidence("cross_copy_pairs") == 0L
        case "cdc_corpus_clean" =>
          // maintained state == direct LWW arithmetic at BOTH scales;
          // verified cross-copy pairs exactly zero (rotation kills
          // cross jaccard, the index verifies exactly); CC O(log n);
          // non-degenerate output. Pair/kept counts are reported
          // evidence only — banded recall and the per-copy LM retrain
          // are fresh hash draws per rotated copy.
          at1.evidence("live_rows") == at1.evidence("expected_live") &&
            atN.evidence("live_rows") == atN.evidence("expected_live") &&
            atN.evidence("cross_pairs") == 0L &&
            atN.evidence("cc_rounds") <= at1.evidence("cc_rounds") + 2 &&
            atN.evidence("out_rows") > 0L
        case "range_join" =>
          atN.evidence("candidates") <=
            (at1.evidence("candidates") * n * 1.5).toLong
        case "corpus_clean" =>
          // Invariants under the blow-up: text cross-copy pairs exactly
          // zero (alphabet rotation is collision-free). Embedding
          // cross-copy pairs are the quantified sign-flip leak (see
          // blowUpEmbeddings): the trial classes that can leak are the
          // C(n,2)·V identical-vector pairs and the 2·C(n,2)·truePairs
          // near-dup pairs, with a per-trial tail governed by Var = Σu⁴ ≥
          // 3/dim — measured at 8-10% on this corpus's concentrated
          // vectors — so the gate sits at 15% of those trials. A
          // genuine quadratic bucket leak draws on C(n,2)·V² trials,
          // orders beyond this bound. Each cross pair can merge two
          // clusters and drop at most one kept doc, so the out_rows
          // lower bound subtracts the MEASURED cross count. Within-copy
          // LSH yield is bounded by the rotation-invariant TRUE pair
          // count (+2 for float-rounding boundary flips); CC rounds
          // stay O(log n); bins grow ~linearly. text_pairs is reported
          // evidence, not gated: simhash Hamming distances redraw per
          // rotated copy, so its count is a per-copy random draw (a
          // candidate blowup would crash out_rows and the exponent).
          val crossTrials = n.toDouble * (n - 1) / 2 *
            (at1.evidence("emb_vectors") + 2 * at1.evidence("emb_true_pairs"))
          val maxCross = math.max(10L, math.ceil(0.15 * crossTrials).toLong)
          atN.evidence("cc_rounds") <= at1.evidence("cc_rounds") + 2 &&
            atN.evidence("text_cross_pairs") == 0L &&
            atN.evidence("emb_cross_pairs") <= maxCross &&
            // within-copy LSH yield vs invariant truth (cross pairs are
            // bounded separately above)
            (atN.evidence("emb_pairs") - atN.evidence("emb_cross_pairs")) <=
              (at1.evidence("emb_true_pairs") + 2) * n &&
            atN.evidence("bins") <= (at1.evidence("bins") * n * 1.5).toLong &&
            atN.evidence("out_rows") >= at1.evidence("out_rows") * (n - 1) -
              atN.evidence("emb_cross_pairs")
        case "ann_lsh" | "ann_ivf" =>
          // fixed query set: k×queries rows at EVERY scale; candidate
          // volume (histogram-derived) may grow at most ~linearly.
          // IVF gets slack 2: its buckets are retrained per corpus, so
          // per-copy bucket shares redistribute under the sign-flip
          // rotation — a genuine quadratic blowup is ~V/queries beyond.
          val slack = if (name == "ann_ivf") 2.0 else 1.5
          atN.evidence("out_rows") == at1.evidence("out_rows") &&
            atN.evidence("candidates") <=
              (at1.evidence("candidates") * n * slack).toLong
        case "ann_quantized" =>
          // the coarse scan is exactly (corpus−1)×queries by
          // construction: (V·n−1)·10 = base·n + (n−1)·10 — an identity
          // (the 10 probe vectors exist once, not per copy); the
          // informative gates are constant output and the exponent
          atN.evidence("out_rows") == at1.evidence("out_rows") &&
            atN.evidence("candidates") ==
              at1.evidence("candidates") * n + (n - 1) * 10
        case "dedup_ngram" =>
          // exact pairs replicate ×N (rotation = shingle-set
          // isomorphism); prefix candidates ~N (2× slack: prefix
          // membership is a fresh hash draw per copy); cross zero
          atN.evidence("out_rows") == at1.evidence("out_rows") * n &&
            atN.evidence("cross_candidates") == 0L &&
            atN.evidence("candidates") <=
              (at1.evidence("candidates") * n * 2.0).toLong
        case "decontam_ngram" =>
          // every doc gets a verdict row (linear), cross-copy inverted-
          // index collisions must be ZERO (rotation disjointness), and
          // candidate volume ~N — slack 2 because each copy's bench
          // subset is an independent hash draw of its shifted ids
          atN.evidence("out_rows") == at1.evidence("out_rows") * n &&
            atN.evidence("cross_candidates") == 0L &&
            atN.evidence("candidates") <=
              (at1.evidence("candidates") * n * 2.0).toLong
        case "decontam_bloom" =>
          // verdict per doc; bit positions bounded by the configured
          // width at BOTH scales; the one-sided guarantee never breaks
          atN.evidence("out_rows") == at1.evidence("out_rows") * n &&
            atN.evidence("positions") <= atN.evidence("m_bits") &&
            at1.evidence("positions") <= at1.evidence("m_bits") &&
            atN.evidence("violations") == 0L &&
            at1.evidence("violations") == 0L
        case "curriculum_order" =>
          // dense 0-based rank cover of [0, rows) at every scale
          atN.evidence("out_rows") == at1.evidence("out_rows") * n &&
            atN.evidence("max_rank") + 1 == atN.evidence("out_rows") &&
            at1.evidence("max_rank") + 1 == at1.evidence("out_rows") &&
            atN.evidence("min_rank") == 0L && at1.evidence("min_rank") == 0L
        case "corpus_shuffle" =>
          // contiguous-bijection identity must hold at scale
          atN.evidence("out_rows") == at1.evidence("out_rows") * n &&
            atN.evidence("max_global_pos") == atN.evidence("out_rows") &&
            at1.evidence("max_global_pos") == at1.evidence("out_rows")
        case "dedup_compact" =>
          // folded layout is O(buckets) — scale-invariant and far
          // below the pre-compact partition sprawl; probe-ingest pairs
          // identical across scales (behavior unchanged by the fold)
          atN.evidence("files_after") == at1.evidence("files_after") &&
            atN.evidence("files_after") <= 64 &&
            atN.evidence("files_before") > atN.evidence("files_after") &&
            atN.evidence("out_rows") == at1.evidence("out_rows") &&
            atN.evidence("store_docs") == at1.evidence("store_docs") * n
        case "text_lm_score" =>
          atN.evidence("out_rows") == at1.evidence("out_rows") * n &&
            atN.evidence("model_types") ==
              at1.evidence("model_types") * n &&
            atN.evidence("distinct_scores") <=
              at1.evidence("distinct_scores") * 101 / 100 &&
            atN.evidence("distinct_scores") >=
              at1.evidence("distinct_scores") * 99 / 100
        case "cdc_serve" =>
          // O(batch) serving: database statements and connections are
          // IDENTICAL against the ×1 and ×N states (same fixed batch,
          // same deterministic key partitioning); statement volume is
          // bounded by the batch (delete+insert per key + the existence
          // probe); every probe key verifiably serves its post-update
          // value; and the state read never leaves the touched buckets
          // (the full state's file census dwarfs what was read, and
          // grows with scale while files_read does not)
          atN.evidence("statements") == at1.evidence("statements") &&
            atN.evidence("connects") == at1.evidence("connects") &&
            at1.evidence("statements") <=
              3 * at1.evidence("batch_keys") + 8 &&
            atN.evidence("out_rows") == atN.evidence("batch_keys") &&
            at1.evidence("out_rows") == at1.evidence("batch_keys") &&
            atN.evidence("state_rows") == at1.evidence("state_rows") * n &&
            atN.evidence("files_read") <= at1.evidence("files_read") * 2 &&
            atN.evidence("state_files") > at1.evidence("state_files") &&
            atN.evidence("state_files") >= atN.evidence("files_read") * 4
        case "dedup_spans" =>
          // copies are span-isomorphic and shingle-disjoint: spans and
          // posting volume replicate EXACTLY ×N, zero cross collisions
          atN.evidence("out_rows") == at1.evidence("out_rows") * n &&
            atN.evidence("cross_dup_hashes") == 0L &&
            atN.evidence("candidates") == at1.evidence("candidates") * n
        case "dedup_semantic" =>
          // one verdict per vector; with nlist ∝ corpus the clustered
          // pair space must stay ~linear (slack 3: cluster sizes under
          // the sign-flip copies redraw per scale)
          atN.evidence("out_rows") == at1.evidence("out_rows") * n &&
            atN.evidence("candidates") <=
              (at1.evidence("candidates") * n * 3.0).toLong
        case "dedup_lines" =>
          // rotation-bijective pages: verdicts and kept counts replicate
          // exactly; any cross-copy fingerprint collision voids the run
          atN.evidence("out_rows") == at1.evidence("out_rows") * n &&
            atN.evidence("sum_kept") == at1.evidence("sum_kept") * n &&
            atN.evidence("cross_fps") == 0L
        case "stats_quantiles" =>
          // constant output, constant sample — at ANY corpus size
          atN.evidence("out_rows") == at1.evidence("out_rows") &&
            atN.evidence("n_sample") == at1.evidence("n_sample")
        case "sketch_cms" =>
          // bounded state: ≤ depth×width cells at EVERY corpus size;
          // fixed copy-0 probe set; one-sided guarantee never breaks
          atN.evidence("cells") <= 192L && at1.evidence("cells") <= 192L &&
            atN.evidence("out_rows") == at1.evidence("out_rows") &&
            atN.evidence("under_estimates") == 0L &&
            at1.evidence("under_estimates") == 0L
        case "sketch_hll" =>
          // constant groups, ×N true distincts, estimate keeps tracking
          // (σ ≈ 13% at m=64; 400‰ is > 3σ — and deterministic here)
          atN.evidence("out_rows") == at1.evidence("out_rows") &&
            atN.evidence("exact_nd_sum") ==
              at1.evidence("exact_nd_sum") * n &&
            atN.evidence("worst_err_permille") <= 400L &&
            at1.evidence("worst_err_permille") <= 400L
        case "quality_domain_filter" =>
          // same domains, k-pinned samples, kept fraction near the
          // requested median (p=0.5) at BOTH scales: 300‰ of slack is
          // > 5σ of the 128-sample median position
          atN.evidence("domains") == at1.evidence("domains") &&
            atN.evidence("total_docs") == at1.evidence("total_docs") * n &&
            math.abs(atN.evidence("kept_permille") - 500L) <= 300L &&
            math.abs(at1.evidence("kept_permille") - 500L) <= 300L
        case "dedup_containment" =>
          // directed pairs replicate ×N exactly; zero cross-copy index
          // collisions; prefix×full candidate volume ~N (2× slack:
          // prefix membership is a fresh hash draw per rotated copy)
          atN.evidence("out_rows") == at1.evidence("out_rows") * n &&
            atN.evidence("cross_candidates") == 0L &&
            atN.evidence("candidates") <=
              (at1.evidence("candidates") * n * 2.0).toLong
        case "stream_sessions" =>
          // the full watermark lifecycle must reproduce each copy's
          // session structure exactly: sessions and event mass ×N
          atN.evidence("out_rows") == at1.evidence("out_rows") * n &&
            atN.evidence("sum_n") == at1.evidence("sum_n") * n
        case "dsir_score" =>
          // one score row per doc, token mass rotation-invariant,
          // model width flat at any corpus size
          atN.evidence("out_rows") == at1.evidence("out_rows") * n &&
            atN.evidence("token_sum") == at1.evidence("token_sum") * n &&
            atN.evidence("model_buckets") == at1.evidence("model_buckets")
        case "event_cooccur" =>
          // pair key set scale-INVARIANT (vocab²-bounded output);
          // pair mass and groups exactly ×N (copied users replay
          // identical baskets)
          atN.evidence("out_rows") == at1.evidence("out_rows") &&
            atN.evidence("pair_mass") == at1.evidence("pair_mass") * n &&
            atN.evidence("n_groups") == at1.evidence("n_groups") * n
        case "graph_pagerank" =>
          // nodes exactly ×N; ZERO cross-copy edges; edge volume ~×N
          // (banding recall is a fresh draw per rotated copy); rank
          // mass within 2% of ×N
          atN.evidence("out_rows") == at1.evidence("out_rows") * n &&
            atN.evidence("cross_edges") == 0L &&
            at1.evidence("cross_edges") == 0L &&
            atN.evidence("edges") >=
              (at1.evidence("edges") * n * 0.9).toLong &&
            atN.evidence("edges") <=
              (at1.evidence("edges") * n * 1.1).toLong &&
            math.abs(atN.evidence("rank_mass") -
              at1.evidence("rank_mass") * n) <=
              (at1.evidence("rank_mass") * n * 0.02).toLong
        case "event_retention" =>
          // invariant cell keys, counts exactly ×N
          atN.evidence("out_rows") == at1.evidence("out_rows") &&
            atN.evidence("active_sum") == at1.evidence("active_sum") * n
        case "profile_table" =>
          // constant output width; row mass ×N; bounded column's
          // exact distincts flat, key column's exactly ×N
          atN.evidence("out_rows") == at1.evidence("out_rows") &&
            atN.evidence("rows_total") == at1.evidence("rows_total") * n &&
            atN.evidence("lang_nd") == at1.evidence("lang_nd") &&
            atN.evidence("id_nd") == at1.evidence("id_nd") * n
        case "coreset_kcenter" =>
          // constant-size output at any corpus size; time is gated by
          // the exponent above
          atN.evidence("out_rows") == at1.evidence("out_rows")
        case "snapshot_diff" =>
          // identical within-copy drift: every change class ×N exactly
          atN.evidence("out_rows") == at1.evidence("out_rows") * n &&
            atN.evidence("n_i") == at1.evidence("n_i") * n &&
            atN.evidence("n_u") == at1.evidence("n_u") * n &&
            atN.evidence("n_d") == at1.evidence("n_d") * n
        case "event_funnel" =>
          // copied users replay identical sequences: every stage ×N,
          // output always |stages| rows
          atN.evidence("out_rows") == at1.evidence("out_rows") &&
            atN.evidence("stage1") == at1.evidence("stage1") * n &&
            atN.evidence("stage2") == at1.evidence("stage2") * n &&
            atN.evidence("stage3") == at1.evidence("stage3") * n
        case "dedup_incremental" =>
          // the probe batch pairs only within itself (its rotation
          // collides with no store copy), so the emitted pairs must be
          // IDENTICAL against the ×1 and ×N stores; the exponent above
          // then measures pure store-size dependence of a fixed batch
          atN.evidence("out_rows") == at1.evidence("out_rows") &&
            atN.evidence("batch_docs") == at1.evidence("batch_docs") &&
            atN.evidence("store_docs") == at1.evidence("store_docs") * n
        case "fuzzy_join" =>
          // matches replicate exactly ×N (rotation-commuting dirty
          // construction) with ZERO cross-copy matches; candidate
          // volume ~N with 2.5× slack — character grams live in a
          // 26³ space, so rotated copies coincidentally share gram
          // STRINGS (unlike word-shingle gates, where cross collisions
          // gate to zero) at a measured ~25% overhead at ×10;
          // cross_candidates rides as reported evidence. The failure
          // this gate exists to catch — one near-dup family flooding a
          // posting list, as the pre-fix frequency-oblivious order did
          // — measured 38× base×N, an order beyond the slack.
          atN.evidence("out_rows") == at1.evidence("out_rows") * n &&
            atN.evidence("cross_pairs") == 0L &&
            atN.evidence("candidates") <=
              (at1.evidence("candidates") * n * 2.5).toLong
        case "corpus_clean_v5" =>
          // spliced decontam stage exact at scale: zero cross-copy
          // inverted-index cells (rotation disjoint-ness), cells ~N
          // with 2× slack. out_rows rides as reported evidence, NOT a
          // gate: the corpus-trained thresholds (LM smoothing
          // denominator, DSIR priors) legitimately move with corpus
          // vocabulary under the blow-up, so the composed survivor
          // count is corpus-dependent by design — each stage's own ×N
          // gate carries the exact replication claims
          atN.evidence("dc_cross_cells") == 0L &&
            atN.evidence("dc_cells") <=
              (at1.evidence("dc_cells") * n * 2.0).toLong
        case "corpus_clean_v6" =>
          // same structural gate as v5 (the spliced decontam stage's
          // exact claims); sem_pairs and out_rows ride as reported
          // evidence — see the runner doc for why the semantic stage's
          // scale claim lives in dedup_semantic's own gate
          atN.evidence("dc_cross_cells") == 0L &&
            atN.evidence("dc_cells") <=
              (at1.evidence("dc_cells") * n * 2.0).toLong
        case "fuzzy_short" =>
          // duplicate-heavy short bucket: matches (fixed right side,
          // left name counts replicate ×N) grow exactly ×N; EVERY
          // candidate is a real match (string-grain verification), so
          // candidates == out_rows — the pre-fix row-level cross made
          // candidates = l_rows·r_rows, 36× out_rows and growing with
          // rows; the distinct cross frame (36×36) never moves
          atN.evidence("out_rows") == at1.evidence("out_rows") * n &&
            atN.evidence("candidates") == atN.evidence("out_rows") &&
            atN.evidence("l_rows") == at1.evidence("l_rows") * n &&
            atN.evidence("distinct_l") == at1.evidence("distinct_l") &&
            atN.evidence("distinct_r") == at1.evidence("distinct_r")
        case "ts_resample" =>
          // copied users keep their timestamps: active-day mass and
          // manufactured gap rows replicate exactly ×N
          atN.evidence("out_rows") == at1.evidence("out_rows") * n &&
            atN.evidence("n_sum") == at1.evidence("n_sum") * n &&
            atN.evidence("gap_rows") == at1.evidence("gap_rows") * n
        case "ts_rolling" =>
          // active key-days and total window mass exactly ×N
          atN.evidence("out_rows") == at1.evidence("out_rows") * n &&
            atN.evidence("window_mass") == at1.evidence("window_mass") * n
        case "ts_anomaly" =>
          // per-key baselines: the flag set replicates exactly ×N
          atN.evidence("out_rows") == at1.evidence("out_rows") * n
        case "event_transitions" =>
          // |types|²-bounded output: ROWS CONSTANT under ×N data,
          // count mass ×N, probabilities bit-identical (p_hash)
          atN.evidence("out_rows") == at1.evidence("out_rows") &&
            atN.evidence("n_mass") == at1.evidence("n_mass") * n &&
            atN.evidence("p_hash") == at1.evidence("p_hash")
        case "event_attribution" =>
          // identical per-copy timelines: attributed conversions and
          // their gap mass replicate exactly ×N
          atN.evidence("out_rows") == at1.evidence("out_rows") * n &&
            atN.evidence("gap_mass") == at1.evidence("gap_mass") * n
        case "event_attribution_linear" =>
          // histogram KEY SET scale-invariant (same combos, hashed),
          // journey counts carry all of ×N
          atN.evidence("out_rows") == at1.evidence("out_rows") &&
            atN.evidence("key_hash") == at1.evidence("key_hash") &&
            atN.evidence("journey_mass") ==
              at1.evidence("journey_mass") * n
        case "event_paths" =>
          // path SET scale-invariant (bounded by |types|^k), per-path
          // key counts ×N
          atN.evidence("out_rows") == at1.evidence("out_rows") &&
            atN.evidence("path_hash") == at1.evidence("path_hash") &&
            atN.evidence("key_mass") == at1.evidence("key_mass") * n
        case "sync_checksum" =>
          // per-copy damage layout identical (256 | copy offset):
          // mismatched chunks and their row masses exactly ×N
          atN.evidence("out_rows") == at1.evidence("out_rows") * n &&
            atN.evidence("n_master_mass") ==
              at1.evidence("n_master_mass") * n &&
            atN.evidence("n_replica_mass") ==
              at1.evidence("n_replica_mass") * n
        case "topk_grouped_agg" =>
          // |groups|·k output and the per-group rank-1 values
          // scale-invariant; no WindowExec anywhere
          atN.evidence("out_rows") == at1.evidence("out_rows") &&
            atN.evidence("top1_mass") == at1.evidence("top1_mass") &&
            atN.evidence("window_nodes") == 0L &&
            at1.evidence("window_nodes") == 0L
        case "q_ntile" =>
          // ranked rows track input; bucket count |groups|·k at both
          // scales; NO WindowExec in the executed plan at either
          atN.evidence("out_rows") == at1.evidence("out_rows") * n &&
            atN.evidence("buckets") == at1.evidence("buckets") &&
            atN.evidence("window_nodes") == 0L &&
            at1.evidence("window_nodes") == 0L
        case "agg_view" =>
          // O(batch) view maintenance: fixed probe, group-row count
          // corpus-invariant, maintained count mass proves the ×N
          // state is in the view, fold confined to ≤ 8 group-buckets;
          // probe time itself is gated by the exponent
          atN.evidence("out_rows") == at1.evidence("out_rows") &&
            atN.evidence("view_cnt_sum") ==
              at1.evidence("view_cnt_sum") * n &&
            atN.evidence("state_rows") == at1.evidence("state_rows") * n &&
            atN.evidence("batch_keys") == at1.evidence("batch_keys") &&
            atN.evidence("touched_view_buckets") <= 8L
        case "minmax_view" =>
          // O(touched groups) min/max maintenance: the fixed probe's
          // groups have corpus-invariant membership (g = id div 64,
          // copies form NEW groups), so the recomputed view rows and
          // their min/max mass are IDENTICAL against the ×1 and ×N
          // stores; the group-bucketed projection confines the
          // recompute to the probe's group spread in buckets; probe
          // time itself is gated by the exponent
          atN.evidence("out_rows") == at1.evidence("out_rows") &&
            atN.evidence("minmax_sum") == at1.evidence("minmax_sum") &&
            atN.evidence("state_rows") == at1.evidence("state_rows") * n &&
            atN.evidence("batch_keys") == at1.evidence("batch_keys") &&
            atN.evidence("touched_proj_buckets") <=
              atN.evidence("probe_groups")
        case "distinct_view" =>
          // O(touched groups) exact distinct-count maintenance: same
          // corpus-invariant group-membership argument as minmax_view —
          // recomputed view rows and uniq mass IDENTICAL against the
          // ×1 and ×N stores, recompute confined to the probe's group
          // spread; probe time gated by the exponent
          atN.evidence("out_rows") == at1.evidence("out_rows") &&
            atN.evidence("uniq_sum") == at1.evidence("uniq_sum") &&
            atN.evidence("state_rows") == at1.evidence("state_rows") * n &&
            atN.evidence("batch_keys") == at1.evidence("batch_keys") &&
            atN.evidence("touched_proj_buckets") <=
              atN.evidence("probe_groups")
        case "stream_scd2" =>
          // O(batch) history maintenance: the fixed probe's keys end
          // with exactly two correctly-linked versions each at BOTH
          // scales — one closed at the update's seq, one current
          atN.evidence("out_rows") == at1.evidence("out_rows") &&
            at1.evidence("out_rows") == 2 * at1.evidence("batch_keys") &&
            atN.evidence("closed_rows") == at1.evidence("batch_keys") &&
            atN.evidence("current_rows") == at1.evidence("batch_keys") &&
            atN.evidence("state_rows") == at1.evidence("state_rows") * n
        case "cdc_dedup" =>
          // O(batch) index maintenance under I/U/D: the fixed probe's
          // post-update pair counts are scale-invariant (pairs confined
          // to copy 0), deleted docs carry zero pairs, state ×N behind
          atN.evidence("out_rows") == at1.evidence("out_rows") &&
            atN.evidence("del_pairs") == 0L &&
            at1.evidence("del_pairs") == 0L &&
            atN.evidence("state_rows") == at1.evidence("state_rows") * n &&
            atN.evidence("batch_keys") == at1.evidence("batch_keys")
        case "ann_incremental" =>
          // O(batch) index maintenance: the fixed probe's post-update
          // rows AND their list assignments (identical frozen
          // centroids) match at both scales; state ×N behind them
          atN.evidence("out_rows") == at1.evidence("out_rows") &&
            atN.evidence("list_sum") == at1.evidence("list_sum") &&
            atN.evidence("state_rows") == at1.evidence("state_rows") * n &&
            atN.evidence("batch_keys") == at1.evidence("batch_keys")
        case "ch_collapse" =>
          // per-copy-identical sign stream: survivors and their exact
          // cents mass replicate ×N
          atN.evidence("out_rows") == at1.evidence("out_rows") * n &&
            atN.evidence("cents_mass") == at1.evidence("cents_mass") * n
        case "ttl_expire" =>
          // rolled grain (day × type) is scale-INVARIANT; its row mass
          // and the live tail carry all of ×N
          atN.evidence("rolled_groups") == at1.evidence("rolled_groups") &&
            atN.evidence("live_rows") == at1.evidence("live_rows") * n &&
            atN.evidence("n_mass") == at1.evidence("n_mass") * n
        case "dict_encode" =>
          // dictionary stays alphabet-sized with the SAME code
          // assignment (uniform ×N preserves frequency order); counts
          // carry ×N
          atN.evidence("out_rows") == at1.evidence("out_rows") &&
            atN.evidence("code_hash") == at1.evidence("code_hash") &&
            atN.evidence("n_mass") == at1.evidence("n_mass") * n
        case "embed_kmeans" =>
          // map-only assignment: zero exchanges at both scales, copy-0
          // assignments bit-identical under frozen centroids
          atN.evidence("out_rows") == at1.evidence("out_rows") * n &&
            atN.evidence("copy0_mass") == at1.evidence("copy0_mass") &&
            atN.evidence("exchange_nodes") == 0L &&
            at1.evidence("exchange_nodes") == 0L
        case "join_bloom" =>
          // build pinned to copy 0: join output scale-invariant; the
          // bloom keeps shuffled volume at the true match count plus a
          // bounded false-positive allowance over the ×N probe
          atN.evidence("out_rows") == at1.evidence("out_rows") &&
            atN.evidence("probe_rows") == at1.evidence("probe_rows") * n &&
            atN.evidence("bloom_kept") <= at1.evidence("bloom_kept") +
              atN.evidence("probe_rows") / 1000
        case "graph_triangles" =>
          // per-copy triangle motifs over disjoint ids: count and
          // base-id vertex mass exactly ×N; the hub stars never close
          atN.evidence("out_rows") == at1.evidence("out_rows") * n &&
            atN.evidence("vertex_mass") == at1.evidence("vertex_mass") * n
        case "ts_ewma" =>
          // identical per-copy series: fold rows and smoothed mass ×N
          atN.evidence("out_rows") == at1.evidence("out_rows") * n &&
            atN.evidence("ewma_mass") == at1.evidence("ewma_mass") * n
        case "ts_holt" =>
          // identical per-copy series: level and trend masses ×N
          atN.evidence("out_rows") == at1.evidence("out_rows") * n &&
            atN.evidence("level_mass") == at1.evidence("level_mass") * n &&
            atN.evidence("trend_mass") == at1.evidence("trend_mass") * n
        case "ts_cusum" =>
          // identical per-copy series: drift mass and alarms ×N
          atN.evidence("out_rows") == at1.evidence("out_rows") * n &&
            atN.evidence("drift_mass") == at1.evidence("drift_mass") * n &&
            atN.evidence("alarms") == at1.evidence("alarms") * n
        case "event_window_funnel" =>
          // same depth histogram keys; every count carries ×N
          atN.evidence("out_rows") == at1.evidence("out_rows") &&
            atN.evidence("group_mass") == at1.evidence("group_mass") * n
        case "ch_summing" =>
          // per-copy-identical measure feed: survivors, count mass and
          // exact cents mass all ×N (negated keys vanish in every copy)
          atN.evidence("out_rows") == at1.evidence("out_rows") * n &&
            atN.evidence("cnt_mass") == at1.evidence("cnt_mass") * n &&
            atN.evidence("cents_mass") == at1.evidence("cents_mass") * n
        case "event_seq_match" =>
          // identical per-copy timelines: histogram keys stable, every
          // key and match count carries ×N
          atN.evidence("out_rows") == at1.evidence("out_rows") &&
            atN.evidence("key_mass") == at1.evidence("key_mass") * n &&
            atN.evidence("match_mass") == at1.evidence("match_mass") * n
        case "event_next_node" =>
          // identical per-copy timelines: next-type histogram stable,
          // key counts ×N
          atN.evidence("out_rows") == at1.evidence("out_rows") &&
            atN.evidence("key_mass") == at1.evidence("key_mass") * n
        case "stats_entropy" =>
          // identical per-copy mixes: rows and count mass ×N, the
          // distinct rounded-contribution set invariant
          atN.evidence("out_rows") == at1.evidence("out_rows") * n &&
            atN.evidence("c_mass") == at1.evidence("c_mass") * n &&
            atN.evidence("h_keys") == at1.evidence("h_keys")
        case "index_prune" =>
          // predicate confined to copy 0: result AND surviving
          // granules scale-invariant while the granule universe grows
          // — the skip ratio is what improves with corpus size
          atN.evidence("out_rows") == at1.evidence("out_rows") &&
            atN.evidence("surviving_blocks") ==
              at1.evidence("surviving_blocks") &&
            atN.evidence("total_blocks") >=
              at1.evidence("total_blocks") * (n.toLong / 2)
        case "text_phrase" =>
          // rotation relocates every other copy's tokens: hits confined
          // to copy 0, scan ×N
          atN.evidence("out_rows") == at1.evidence("out_rows") &&
            atN.evidence("hit_mass") == at1.evidence("hit_mass")
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
    // file first (source of truth), stdout line last — see QuietExit
    Files.write(Paths.get(sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT",
        "BENCH_scale.json")),
      (line + "\n").getBytes(StandardCharsets.UTF_8))
    tempDirs.foreach(deleteRecursively)
    QuietExit.emitAndExit(spark, Some(line))
    } finally {
      tempDirs.foreach(deleteRecursively)
      spark.stop()
    }
  }
}
