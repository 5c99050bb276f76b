package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *   - [[bruteForceTopK]] — the exact baseline: query × corpus join with a
  *     codegen'd cosine expression, ranked per query. Correct at any k,
  *     quadratic in corpus size. With a small query set the join is a
  *     broadcast of the queries, so the corpus is scanned exactly once
  *     and never shuffled — at 100 TB this is a map-only pass plus a
  *     per-query top-k (partial top-k per partition, merged on the
  *     driver-side reduce of the window/limit).
  *   - [[lshTopK]] — the scale path: random-hyperplane LSH. Each vector
  *     gets a `bits`-wide sign bucket; queries only meet corpus vectors
  *     in the same bucket (one shuffle on bucket id, multi-probe over
  *     nearby buckets for recall). Cost per query drops from O(corpus)
  *     to O(bucket).
  *
  * Cosine is computed in double precision from sequential left-folds
  * (`aggregate`) so the value is deterministic under any row order — the
  * fold order is the array order, not the partition order.
  */
object Similarity {

  /** Cosine similarity of two `array<float|double>` columns, in double. */
  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(ad, x => x * x),
      lit(0.0), (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(bd, x => x * x),
      lit(0.0), (acc, x) => acc + x))
    dot / (na * nb)
  }

  /** Codegen'd native cosine ([[graft.functions.expr.CosineSimilarity]]):
    * bit-identical to [[cosine]] but a single fused loop per row instead
    * of interpreted higher-order lambdas — the scale path for the ANN
    * inner loop. Requires [[graft.GraftExtensions]] on the session. */
  def cosineNative(a: Column, b: Column): Column =
    call_function("cosine_sim",
      a.cast("array<double>"), b.cast("array<double>"))

  private def cosineBy(native: Boolean)(a: Column, b: Column): Column =
    if (native) cosineNative(a, b) else cosine(a, b)

  /** Exact top-k neighbors for each query vector (self-matches excluded).
    * Returns (query_id, neighbor_id, rank, sim) with sim rounded to
    * `roundTo` decimals BEFORE ranking, id-tiebroken — so the ranking is
    * stable across engines that sum floating point in different orders.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      roundTo: Int = 4, native: Boolean = false): DataFrame = {
    // cast to double at the leaves (once per row, not once per pair) and
    // split the corpus scan across all cores: the nested-loop join's
    // parallelism is the streamed side's partition count, and a small
    // parquet corpus arrives as a single partition
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv")).repartition(par)
    val scored = c.join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("sim",
        round(cosineBy(native)(col("qv"), col("cv")), roundTo))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("sim"))
  }

  /** Hard-negative mining for contrastive training: for each query,
    * the k most-cosine-similar corpus vectors with a DIFFERENT label —
    * similar-but-wrong examples, the ones a contrastive loss learns
    * most from (the DPR in-batch-negatives recipe, Karpukhin et al.
    * 2020, arXiv:2004.04906). Same shape as [[bruteForceTopK]]
    * (broadcast queries, scan-local scoring, per-query
    * WindowGroupLimit top-k); at corpus scale swap the scorer for the
    * LSH/IVF candidate generators exactly as ann_lsh/ann_ivf do — the
    * label predicate composes with any of them since it rides the
    * candidate row. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label", roundTo: Int = 4,
      native: Boolean = false): DataFrame = {
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(labelCol).as("query_label"),
      col(vecCol).cast("array<double>").as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("neighbor_label"),
      col(vecCol).cast("array<double>").as("cv")).repartition(par)
    val scored = c.join(q, col("neighbor_label") =!= col("query_label"))
      .withColumn("sim",
        round(cosineBy(native)(col("qv"), col("cv")), roundTo))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("neighbor_label"), col("rank"), col("sim"))
  }

  /** Greedy k-center coreset selection (farthest-point traversal,
    * Gonzalez 1985; the k-Center-Greedy of Sener & Savarese 2018,
    * arXiv:1708.00489): pick the seed (lowest id), then k−1 times pick
    * the point LEAST covered by the chosen set — cover = max rounded
    * cosine to any selected center, ties to the smallest id. The
    * data-selection use: a diversity-maximizing subset whose cover
    * radius is 2-optimal, e.g. a representative eval slice or a
    * dedup-aware sampling skeleton.
    *
    * Determinism: cover is a `greatest` of per-center cosines each
    * rounded to `roundTo` BEFORE comparison (the ann_* convention), so
    * argmin + id tie-break replays exactly; every iteration recomputes
    * cover from scratch over the selected set (stateless — no growing
    * lineage), which is what the chained-CTE oracle replays.
    *
    * Scale shape: k scans, each scan-local over the broadcast center
    * list (centers are k literal vectors — driver state is k·dim
    * doubles, the bounded-collect convention); argmin is a
    * TakeOrdered(1). O(k·n) distance evaluations total, never a
    * shuffle of the corpus. For k in the hundreds, switch to the
    * incremental min-cover column with a localCheckpoint every few
    * rounds (one distance eval per point per round) — same selection,
    * different lineage management. */
  def kCenterCoreset(emb: DataFrame, k: Int, idCol: String = "vec_id",
      vecCol: String = "embedding", roundTo: Int = 4,
      native: Boolean = false): DataFrame = {
    require(k >= 1, "kCenterCoreset: k must be >= 1")
    val spark = emb.sparkSession
    import spark.implicits._
    val base = emb.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v")).persist()
    try {
      val seed = base.orderBy(col("id")).limit(1).head()
      val picked = scala.collection.mutable.Buffer(
        (1, seed.getLong(0), 1.0, seed.getSeq[Double](1).toArray))
      for (i <- 2 to k) {
        val cover = picked.map(c =>
          round(cosineBy(native)(col("v"), lit(c._4)), roundTo))
          .reduceLeft(greatest(_, _))
        val ids = picked.map(_._2).toSeq
        val next = base.filter(!col("id").isInCollection(ids))
          .withColumn("cover", cover)
          .orderBy(col("cover").asc, col("id").asc).limit(1).head()
        picked += ((i, next.getLong(0), next.getDouble(2),
          next.getSeq[Double](1).toArray))
      }
      picked.map(c => (c._1, c._2, c._3)).toSeq
        .toDF("rank", "vec_id", "cover_sim")
    } finally base.unpersist(false)
  }

  /** Embedding-cosine near-duplicate pairs: all (a, b), a < b, with
    * rounded cosine ≥ threshold. Exact QUADRATIC form — the small-input
    * oracle twin of [[lshCosinePairs]], which is the primary (scale)
    * API: at 100 TB an O(n²) self-join is a non-starter, while the
    * LSH-bucketed path is linear in candidates.
    */
  def cosinePairs(corpus: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      roundTo: Int = 4, native: Boolean = false): DataFrame = {
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val a = corpus.select(col(idCol).as("a"),
      col(vecCol).cast("array<double>").as("va")).repartition(par)
    val b = corpus.select(col(idCol).as("b"),
      col(vecCol).cast("array<double>").as("vb"))
    a.join(b, col("a") < col("b"))
      .withColumn("sim",
        round(cosineBy(native)(col("va"), col("vb")), roundTo))
      .filter(col("sim") >= threshold)
      .select(col("a"), col("b"), col("sim"))
  }

  /** All XOR masks flipping ≤ `probeDist` of `bits` bits — the
    * multi-probe neighborhood shared by [[lshTopK]] and
    * [[lshCosinePairs]]. */
  private def lshFlipMasks(bits: Int, probeDist: Int): Seq[Long] = {
    require(probeDist >= 0 && probeDist <= bits,
      s"probeDist=$probeDist out of range [0, $bits]")
    (0 to probeDist).flatMap(d =>
      (0 until bits).combinations(d).map(_.map(1L << _).sum))
  }

  /** Embedding near-duplicate pairs AT SCALE: multi-table
    * random-hyperplane LSH candidate generation + exact-cosine verify —
    * the same candidates-then-verify shape as [[graft.operators.Dedup
    * .minhashDedupPairs]] uses for text (bands ≈ tables).
    *
    * One `tables × bits`-plane signature is computed per vector (a
    * single packed long); table t's bucket is bit-slice
    * [t·bits, (t+1)·bits). A pair is a candidate iff its buckets in
    * SOME table differ in ≤ `probeDist` bits — L independent tables
    * boost recall from p^b to 1-(1-p^b)^L while each table's candidate
    * join stays an equi-join on (table, bucket). Candidates are
    * de-duplicated (a pair can collide in several tables) before the
    * exact cosine verify, so precision is 1 by construction and the
    * corpus is never self-cross-joined. `tables=1, bits=1,
    * probeDist=1` provably equals the quadratic [[cosinePairs]] (every
    * pair is a candidate).
    */
  def lshCosinePairs(corpus: DataFrame, threshold: Double,
      bits: Int = 8, probeDist: Int = 1, tables: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dim: Int = 64, roundTo: Int = 4,
      native: Boolean = false): DataFrame = {
    require(tables >= 1 && tables * bits <= 63,
      s"lshCosinePairs: tables*bits=${tables * bits} must fit a long")
    val planes = hyperplanes(tables * bits, dim)
    val masks = lshFlipMasks(bits, probeDist)
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val raw = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val base = raw.repartition(par)
      .withColumn("sig", bucketId(col("v"), planes))
    def tableBucket(t: Int): Column =
      shiftrightunsigned(col("sig"), t * bits)
        .bitwiseAND(lit((1L << bits) - 1))
    val bucketSide = base.select(col("id").as("b"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("tbl"), tableBucket(t).as("bucket"))): _*))
        .as("tb"))
      .select(col("b"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val probeSide = base.select(col("id").as("a"),
      explode(array((for (t <- 0 until tables; m <- masks) yield
        struct(lit(t).as("tbl"),
          tableBucket(t).bitwiseXOR(lit(m)).as("bucket"))): _*)).as("tb"))
      .select(col("a"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    // ids-only candidate pipeline: vectors never ride through the
    // explode/join/distinct shuffles — they rejoin for the verify
    val cand = probeSide.join(bucketSide, Seq("tbl", "bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    // rejoin vectors from the RAW projection (no repartition, no
    // signature computation — those exist only for the candidate side)
    val va = raw.select(col("id").as("a"), col("v").as("va"))
    val vb = raw.select(col("id").as("b"), col("v").as("vb"))
    cand.join(va, "a").join(vb, "b")
      .withColumn("sim",
        round(cosineBy(native)(col("va"), col("vb")), roundTo))
      .filter(col("sim") >= threshold)
      .select(col("a"), col("b"), col("sim"))
  }

  /** Deterministic pseudo-random hyperplanes: component d of plane j is
    * derived from md5(j ++ "_" ++ d), uniform in [-1, 1). Driver-side
    * constants — they compile into the plan as literals, so every
    * executor (and every retry) sees identical planes. */
  def hyperplanes(bits: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(bits, dim) { (j, d) =>
      val digest = MessageDigest.getInstance("MD5")
        .digest(s"${j}_$d".getBytes("UTF-8"))
      val v = java.lang.Long.parseLong(
        digest.take(7).map(b => f"$b%02x").mkString, 16)
      (v.toDouble / java.lang.Math.pow(16, 14)) * 2.0 - 1.0
    }

  /** Sign-bucket id of a vector under the given hyperplanes: bit j is the
    * sign of <v, plane_j>. The planes ride as ONE `typedlit` 2-D array
    * literal (a single plan node) — inlining each component as its own
    * literal made the expression tree thousands of nodes wide, and plan
    * analysis + codegen dominated runtime on small inputs. */
  def bucketId(vec: Column, planes: Array[Array[Double]]): Column = {
    val vd = vec.cast("array<double>")
    val ps = typedlit(planes.map(_.toSeq).toSeq)
    aggregate(
      transform(ps, (p, j) => {
        val dot = aggregate(zip_with(vd, p, (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x)
        // SQL-level shiftleft: the Scala helper only takes an Int
        // literal, but j is the lambda's index column
        when(dot >= 0, call_function("shiftleft", lit(1L), j))
          .otherwise(lit(0L))
      }),
      lit(0L), (acc, x) => acc + x)
  }

  /** K-means centroids for IVF. The training set is a bounded,
    * deterministic sample (lowest `trainSample` ids) — ONE collect of
    * ~sample×dim doubles — and Lloyd iterations run driver-side in plain
    * Scala. This is the right split at any corpus size: training cost is
    * constant (the sample bound), while the expensive step — assigning
    * the full corpus to buckets — happens exactly once, distributed, in
    * [[ivfTopK]]. (The previous version ran each training pass as a
    * Spark job; on small inputs plan analysis dwarfed the arithmetic.)
    */
  def kmeansCentroids(corpus: DataFrame, dim: Int, k: Int = 16,
      iters: Int = 3, idCol: String = "vec_id",
      vecCol: String = "embedding",
      trainSample: Int = 2048): Array[Array[Double]] = {
    val sample: Array[Array[Double]] = corpus
      .select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .orderBy(col(idCol)).limit(trainSample)
      .select("v").collect()
      .map(_.getSeq[Double](0).toArray)
    sample.foreach(v => require(v.length == dim,
      s"kmeansCentroids: vector of length ${v.length}, expected dim=$dim"))

    def localCosine(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    // argmax with ties to the HIGHEST index — same winner as the plan's
    // array_max over struct(sim, index)
    def nearest(v: Array[Double], cs: Array[Array[Double]]): Int = {
      var best = 0; var bestS = Double.NegativeInfinity
      for (i <- cs.indices) {
        val s = localCosine(v, cs(i))
        // skip NaN (zero-norm degenerate vectors): plan-side array_max
        // would rank NaN greatest, driver-side >= would keep index 0 —
        // neither is a meaningful assignment, so NaN never wins here
        if (!s.isNaN && s >= bestS) { bestS = s; best = i }
      }
      best
    }

    var cents = sample.take(k).map(_.clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k, dim)(0.0)
      val counts = new Array[Int](k)
      sample.foreach { v =>
        val c = nearest(v, cents)
        counts(c) += 1
        var d = 0
        while (d < dim) { sums(c)(d) += v(d); d += 1 }
      }
      cents = cents.zipWithIndex.map { case (old, i) =>
        if (counts(i) == 0) old // empty cluster keeps its centroid
        else sums(i).map(_ / counts(i))
      }
    }
    cents
  }

  /** Index of the max-cosine centroid for a vector. Centroids ride as ONE
    * `typedlit` 2-D literal (identical on every executor and retry);
    * the argmax is `array_max` over (sim, index) structs built by
    * `transform`, so the tree stays a handful of nodes at any nlist. */
  def nearestCentroid(vec: Column, cents: Array[Array[Double]],
      native: Boolean = false): Column =
    array_max(centroidScores(vec, cents, native)).getField("i")

  /** (cosine, index) struct per centroid, for argmax / probe ranking. */
  private def centroidScores(vec: Column, cents: Array[Array[Double]],
      native: Boolean): Column = {
    val cs = typedlit(cents.map(_.toSeq).toSeq)
    transform(cs, (c, i) =>
      struct(cosineBy(native)(vec, c).as("s"), i.as("i")))
  }

  /** IVF top-k: corpus vectors live in their nearest-centroid bucket;
    * a query probes its `nprobe` closest centroids and ranks only those
    * buckets' vectors. `nprobe = nlist` provably equals brute force
    * (every bucket probed); smaller nprobe trades recall for a
    * 1/(nlist/nprobe) cut in comparisons. The candidate join is an
    * equi-join on bucket id — same shuffle shape as the LSH path, but
    * buckets adapt to the data distribution instead of random planes. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      dim: Int = 64, nlist: Int = 16, nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      roundTo: Int = 4, native: Boolean = false): DataFrame = {
    val cents = kmeansCentroids(corpus, dim, nlist, idCol = idCol,
      vecCol = vecCol)
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv")).repartition(par)
      .withColumn("bucket", nearestCentroid(col("cv"), cents, native))
    ivfTopKAssigned(c, queries, cents, k, nprobe, idCol, vecCol,
      roundTo, native)
  }

  /** IVF probe against a corpus whose bucket assignment is ALREADY
    * materialized — the serving path of an incrementally-maintained
    * index ([[graft.streaming.VectorIndex]]), where assignment happened
    * at ingest under frozen centroids and re-deriving it per query
    * would defeat the index. `corpusAssigned` must expose
    * `(neighbor_id, cv: array<double>, bucket)`. */
  def ivfTopKAssigned(corpusAssigned: DataFrame, queries: DataFrame,
      cents: Array[Array[Double]], k: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      roundTo: Int = 4, native: Boolean = false): DataFrame = {
    // query side: rank all centroids, keep the nprobe closest
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
      .withColumn("probe", slice(reverse(array_sort(
        centroidScores(col("qv"), cents, native))), 1, nprobe))
      .select(col("query_id"), col("qv"),
        explode(col("probe").getField("i")).as("bucket"))
    val scored = corpusAssigned.join(q, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim",
        round(cosineBy(native)(col("qv"), col("cv")), roundTo))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("sim"))
  }

  /** Symmetric per-vector int8 quantization: scale = max|x| / 127,
    * q_i = round(x_i / scale). 4× smaller than float32 — at 100 TB the
    * brute-force scan is memory-bandwidth-bound, so quantized vectors
    * scan 4× faster and the float corpus is only touched for the
    * rescoring candidates. */
  def quantizeInt8(vec: Column): Column = {
    val vd = vec.cast("array<double>")
    val scale = greatest(
      aggregate(transform(vd, x => abs(x)), lit(0.0),
        (acc, x) => greatest(acc, x)),
      lit(java.lang.Double.MIN_VALUE)) / 127.0
    struct(scale.as("scale"),
      transform(vd, x => round(x / scale, 0).cast("tinyint")).as("q"))
  }

  /** Approximate cosine from two int8 quantizations (dot of the
    * quantized values, norms from the quantized values — scales cancel
    * in the cosine, so only rounding error remains). */
  def cosineQuantized(a: Column, b: Column): Column = {
    val qa = a.getField("q").cast("array<double>")
    val qb = b.getField("q").cast("array<double>")
    cosine(qa, qb)
  }

  /** Quantized-scan ANN with exact rescoring: rank the corpus by int8
    * cosine, keep `rescore` candidates per query, re-rank those with
    * exact float cosine, return top k. With rescore ≈ 3k the int8
    * rounding error almost never evicts a true top-k neighbor before
    * rescoring (spec-verified recall). */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      rescore: Int = 30, idCol: String = "vec_id",
      vecCol: String = "embedding", roundTo: Int = 4,
      native: Boolean = false): DataFrame = {
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"),
      quantizeInt8(col(vecCol)).as("qq")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"),
      quantizeInt8(col(vecCol)).as("cq")).repartition(par)
    val coarse = c.join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("qsim", cosineQuantized(col("qq"), col("cq")))
    val wCoarse = Window.partitionBy(col("query_id"))
      .orderBy(col("qsim").desc, col("neighbor_id"))
    val candidates = coarse
      .withColumn("crank", row_number().over(wCoarse))
      .filter(col("crank") <= rescore)
    val wExact = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    candidates
      .withColumn("sim",
        round(cosineBy(native)(col("qv"), col("cv")), roundTo))
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("sim"))
  }

  /** Number of (query, corpus-vector) pairs the LSH probe join
    * materializes — computed from bucket HISTOGRAMS (two tiny
    * aggregations, never the pairs themselves), so the scale harness
    * can gate candidate growth at ×N without paying the join. Counts
    * include the query's own vector when it shares a probed bucket
    * (the join filters those later) — an overcount of ≤ queries. */
  def lshCandidateCount(corpus: DataFrame, queries: DataFrame,
      bits: Int = 8, probeDist: Int = 1, idCol: String = "vec_id",
      vecCol: String = "embedding", dim: Int = 64): Long = {
    val planes = hyperplanes(bits, dim)
    val masks = lshFlipMasks(bits, probeDist)
    val ch = corpus
      .select(bucketId(col(vecCol).cast("array<double>"), planes)
        .as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c"))
    val qb = queries
      .select(col(idCol).as("query_id"),
        bucketId(col(vecCol).cast("array<double>"), planes).as("qb"))
      .select(col("query_id"), explode(array(
        masks.map(f => col("qb").bitwiseXOR(lit(f))): _*)).as("bucket"))
      .distinct()
    qb.join(ch, "bucket")
      .agg(coalesce(sum(col("c")), lit(0L))).head().getLong(0)
  }

  /** IVF analog of [[lshCandidateCount]]: vectors in the `nprobe`
    * probed buckets summed over queries, from a bucket histogram. */
  def ivfCandidateCount(corpus: DataFrame, queries: DataFrame,
      dim: Int = 64, nlist: Int = 16, nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      native: Boolean = false): Long = {
    val cents = kmeansCentroids(corpus, dim, nlist, idCol = idCol,
      vecCol = vecCol)
    val ch = corpus
      .select(nearestCentroid(col(vecCol).cast("array<double>"), cents,
        native).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c"))
    val qb = queries
      .select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .select(col("query_id"), explode(slice(reverse(array_sort(
        centroidScores(col("qv"), cents, native))), 1, nprobe)
        .getField("i")).as("bucket"))
    qb.join(ch, "bucket")
      .agg(coalesce(sum(col("c")), lit(0L))).head().getLong(0)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): k-means cluster the embedding space, then call a
    * vector a duplicate iff SOME lower-id vector in the SAME cluster has
    * cosine ≥ `threshold`; its keeper (`dup_of`) is the smallest such id.
    *
    * Shape for 100 TB: centroid training is a bounded deterministic
    * sample (ONE constant-size collect, [[kmeansCentroids]]); cluster
    * assignment is one distributed scan; and the pair space is bounded
    * per-cluster — Σ|cluster|²  instead of n², so `nlist` scales with
    * the corpus to keep clusters machine-sized. Cross-cluster near-dups
    * are missed BY DESIGN (that is SemDeDup's recall/cost trade); the
    * exactness claim is "exactly the clustered policy", which the oracle
    * replays centroid-for-centroid.
    *
    * `among` (optional) restricts the PAIR SPACE to the given ids (one
    * column named `vec_id`) while the centroids still train on the full
    * `corpus` — the "cluster once, dedup each curation round" posture a
    * composed pipeline wants: a later stage dedups its survivor set
    * against itself, not against documents earlier stages already
    * dropped, and the cluster geometry stays the shared, gated one.
    *
    * @return one row per (restricted) vector:
    *         (vec_id, bucket, dup_of, is_dup)
    */
  def semanticDupes(corpus: DataFrame, threshold: Double, dim: Int = 64,
      nlist: Int = 16, idCol: String = "vec_id",
      vecCol: String = "embedding", roundTo: Int = 4,
      native: Boolean = false, among: Option[DataFrame] = None)
      : DataFrame = {
    val cents = kmeansCentroids(corpus, dim, nlist, idCol = idCol,
      vecCol = vecCol)
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val scoped = among.fold(corpus)(ids =>
      corpus.join(ids, corpus(idCol) === ids("vec_id"), "left_semi"))
    val assigned = scoped
      .select(col(idCol).as("vec_id"),
        col(vecCol).cast("array<double>").as("v"))
      .repartition(par)
      .withColumn("bucket", nearestCentroid(col("v"), cents, native))
    val a = assigned.select(col("bucket"), col("vec_id").as("a"),
      col("v").as("va"))
    val b = assigned.select(col("bucket"), col("vec_id").as("b"),
      col("v").as("vb"))
    // within-cluster equi-join; the lowest colliding lower id wins
    val dupOf = a.join(b, Seq("bucket"))
      .filter(col("a") < col("b"))
      .filter(round(cosineBy(native)(col("va"), col("vb")), roundTo)
        >= threshold)
      .groupBy(col("b").as("vec_id"))
      .agg(min(col("a")).as("dup_of"))
    assigned.select(col("vec_id"), col("bucket"))
      .join(dupOf, Seq("vec_id"), "left")
      .select(col("vec_id"), col("bucket").cast("int").as("bucket"),
        col("dup_of"),
        col("dup_of").isNotNull.cast("int").as("is_dup"))
  }

  /** Approximate top-k via random-hyperplane LSH with multi-probe: a
    * corpus vector is a candidate for a query if their buckets differ in
    * at most `probeDist` bits. The candidate join runs on exploded
    * (probe-bucket, id) keys — equi-join, one shuffle — and only
    * candidates get the exact cosine. Recall rises with `probeDist` and
    * falls with `bits`; (bits=8, probeDist=1) ≈ recall ~0.9 on uniform
    * data while cutting comparisons ~an order of magnitude. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      bits: Int = 8, probeDist: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dim: Int = 64, roundTo: Int = 4, native: Boolean = false): DataFrame = {
    val planes = hyperplanes(bits, dim)
    // query side: explode every bucket within probeDist bit flips — ALL
    // ≤probeDist-sized bit subsets, so probeDist=2 really probes the
    // 2-bit neighborhood (an earlier version silently degraded to 1)
    val masks = lshFlipMasks(bits, probeDist)
    val probes: Column => Column = b =>
      array(masks.map(f => b.bitwiseXOR(lit(f))): _*)
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
      .select(col("query_id"), col("qv"),
        bucketId(col("qv"), planes).as("qb"))
      .select(col("query_id"), col("qv"),
        explode(probes(col("qb"))).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv")).repartition(par)
      .select(col("neighbor_id"), col("cv"),
        bucketId(col("cv"), planes).as("bucket"))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("qv"), col("cv"))
      .distinct() // a pair can collide in several probe buckets
      .withColumn("sim",
        round(cosineBy(native)(col("qv"), col("cv")), roundTo))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("sim"))
  }
}
