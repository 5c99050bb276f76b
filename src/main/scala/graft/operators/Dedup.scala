package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for document corpora: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard.
  *
  * Scale design (the 100 TB story):
  *   - Exact dedup is one hash-shuffle on a 32-char fingerprint — the
  *     cheapest possible key, no document text moves through the shuffle.
  *   - Pairwise n-gram Jaccard ([[ngramJaccardPairs]]) is the exact
  *     quadratic baseline; its inverted-index join explodes on frequent
  *     shingles, so it caps per-shingle posting lists ([[maxShingleDf]]) —
  *     a standard prefix-filtering guard. Use it to VERIFY candidates,
  *     not to generate them, beyond ~10^6 docs.
  *   - MinHash LSH ([[minhashCandidates]]) is the scale path: cost is
  *     linear in corpus size (k hashes per doc), candidate generation is
  *     a self-equi-join on (band, bandKey) — Spark shuffles both sides on
  *     the band key, so only genuinely colliding docs ever meet. False
  *     positives are then verified with exact Jaccard on the (small)
  *     candidate set.
  *   - SimHash gives a single 64-bit signature per doc; near-dup pairs
  *     are signatures within Hamming distance d. At scale the pair join
  *     uses the rotation trick (d+1 key blocks); here the corpus-sized
  *     cross join is kept for the small-SF oracle and the block-key path
  *     is exposed via [[simhashBlockKeys]].
  *
  * All hashing is md5-based ([[graft.functions.TextFunctions.hash60]]) so
  * an external SQL oracle reproduces every signature bit-for-bit.
  */
object Dedup {

  /** Exact dedup: keep the lowest doc_id per content fingerprint.
    * One shuffle on the 32-char fingerprint; text never shuffles. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("_fp", fingerprint(col(textCol)))
      .groupBy(col("_fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .drop("_fp")

  /** Per-document distinct n-gram shingle sets (cached shape shared by the
    * Jaccard and MinHash paths). */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      shingles(col(textCol), n).as("sh"))

  /** Exact pairwise n-gram Jaccard ≥ `threshold` via an inverted-index
    * self-join on shingles. `maxShingleDf` drops shingles whose posting
    * list exceeds the cap (stopword-like shingles that generate quadratic
    * candidate blowup while carrying no discriminative signal). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8,
      maxShingleDf: Int = Int.MaxValue): DataFrame = {
    val sets = shingleSets(docs, idCol, textCol, n)
    val sizes = sets.select(col("doc_id"), size(col("sh")).as("n_sh"))
    var posting = sets.select(col("doc_id"), explode(col("sh")).as("g"))
    if (maxShingleDf != Int.MaxValue) {
      val rare = posting.groupBy("g").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxShingleDf).select("g")
      posting = posting.join(rare, Seq("g"))
    }
    val common = posting.as("x")
      .join(posting.as("y"),
        col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "a")
        .withColumnRenamed("n_sh", "na"), Seq("a"))
      .join(sizes.withColumnRenamed("doc_id", "b")
        .withColumnRenamed("n_sh", "nb"), Seq("b"))
      .withColumn("jaccard",
        col("common") / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** MinHash signature: array of k minima, sig[i] = min over shingles of
    * h_i(shingle). Linear in corpus size; no shuffle. */
  def minhashSignature(sh: Column, k: Int): Column =
    array((0 until k).map(i =>
      array_min(transform(sh, s => hash60Seeded(i, s)))): _*)

  /** LSH candidate pairs: split the k-wide signature into `bands` bands of
    * k/bands rows; docs agreeing on any full band collide. Returns
    * distinct (a, b) with a < b. The join key is (band index, joined band
    * values) — one shuffle, no quadratic scan. */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 16, bands: Int = 4): DataFrame = {
    require(k % bands == 0, s"k=$k not divisible by bands=$bands")
    val r = k / bands
    val sets = shingleSets(docs, idCol, textCol, n)
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), k))
    val banded = sets.select(
      col("doc_id"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          concat_ws("_", (0 until r).map(i =>
            element_at(col("sig"), b * r + i + 1).cast("string")): _*)
            .as("key"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
    banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
  }

  /** MinHash LSH dedup end-to-end: LSH candidates verified with exact
    * Jaccard (computed only for colliding pairs — the candidate set is
    * tiny relative to the corpus, so the verify join broadcasts). */
  def minhashDedupPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 16, bands: Int = 4,
      threshold: Double = 0.8): DataFrame = {
    val cands = minhashCandidates(docs, idCol, textCol, n, k, bands)
    val sets = shingleSets(docs, idCol, textCol, n)
    val withSets = cands
      .join(sets.select(col("doc_id").as("a"), col("sh").as("sha")), Seq("a"))
      .join(sets.select(col("doc_id").as("b"), col("sh").as("shb")), Seq("b"))
    withSets
      .withColumn("common", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard", col("common") /
        (size(col("sha")) + size(col("shb")) - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** 60-bit SimHash over whitespace tokens (frequency-weighted: each token
    * occurrence votes ±1 per bit; bit j of the signature is 1 iff the vote
    * sum is positive). Computed without explode: one aggregate expression
    * per bit over the token hash array — linear, no shuffle. */
  def simhash(text: Column, bits: Int = 60): Column = {
    val hashes = transform(tokens(text), t => hash60(t))
    val bitCols = (0 until bits).map { j =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1L) === 1L, 1L)
          .otherwise(-1L))
      when(votes > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** SimHash near-dup pairs with Hamming distance ≤ `maxDist`. Small-SF
    * shape: corpus self-join (the oracle path). For scale, generate
    * candidates through [[simhashBlockKeys]] and verify only collisions. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    val sigs = docs.select(col(idCol).as("doc_id"),
      simhash(col(textCol)).as("sig"))
    sigs.as("x").join(sigs.as("y"), col("x.doc_id") < col("y.doc_id"))
      .withColumn("dist",
        expr("bit_count(x.sig ^ y.sig)"))
      .filter(col("dist") <= maxDist)
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"), col("dist"))
  }

  /** Rotation-trick block keys for SimHash at scale: split the signature
    * into `maxDist + 1` blocks; by pigeonhole, any pair within Hamming
    * distance `maxDist` agrees exactly on at least one block, so an
    * equi-join on (block index, block value) finds all true pairs with
    * one shuffle instead of a cross join. */
  def simhashBlockKeys(sig: Column, maxDist: Int, bits: Int = 60): Column = {
    val blocks = maxDist + 1
    val width = bits / blocks
    array((0 until blocks).map { b =>
      val lo = b * width
      val w = if (b == blocks - 1) bits - lo else width
      struct(lit(b).as("block"),
        shiftright(sig, lo).bitwiseAND((1L << w) - 1).as("key"))
    }: _*)
  }

  /** SimHash near-dup pairs via the rotation trick: explode block keys,
    * self-equi-join on (block, key), verify Hamming distance on the
    * collisions only. Same result as [[simhashPairs]], linear shuffle. */
  def simhashPairsBlocked(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    val sigs = docs.select(col(idCol).as("doc_id"),
      simhash(col(textCol)).as("sig"))
    val keyed = sigs.select(col("doc_id"), col("sig"),
      explode(simhashBlockKeys(col("sig"), maxDist)).as("bk"))
      .select(col("doc_id"), col("sig"), col("bk.block"), col("bk.key"))
    keyed.as("x")
      .join(keyed.as("y"),
        col("x.block") === col("y.block") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        expr("bit_count(x.sig ^ y.sig)").as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }
}
