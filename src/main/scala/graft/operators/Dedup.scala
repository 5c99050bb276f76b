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
  *   - n-gram Jaccard ([[ngramJaccardPairs]]) is EXACT pairwise dedup
  *     made tractable by prefix filtering: under a global ordering of
  *     shingles (here: by 60-bit hash value), two sets with Jaccard ≥ t
  *     must share an element within each other's first
  *     ⌊(1−t)·|A|⌋+1 shingles — so only the prefix is inverted-indexed,
  *     shrinking both the posting lists and the candidate-pair count by
  *     ~1/(1−t)² while keeping recall = 1 (AllPairs/PPJoin family,
  *     SNIPPETS.md). Verification runs a sorted-merge intersection on the
  *     pre-sorted hash arrays — a native codegen'd expression, no per-row
  *     allocation.
  *   - MinHash LSH ([[minhashCandidates]]) is the approximate scale path:
  *     one md5 per shingle, then a k-wide signature from an LCG hash
  *     family in a single fused pass ([[graft.functions.expr.MinHashSig]]),
  *     banded into an equi-join — linear cost, one shuffle on band keys.
  *   - SimHash gives one 64-bit signature per doc in one fused pass
  *     ([[graft.functions.expr.SimHash60]]); near-dup pairs join on
  *     pigeonhole block keys ([[simhashPairsBlocked]]) instead of a cross
  *     join.
  *
  * All hashing is md5-based ([[graft.functions.TextFunctions.hash60]]) +
  * integer arithmetic so an external SQL oracle reproduces every
  * signature bit-for-bit. Requires [[graft.GraftExtensions]] registered
  * on the session (native expressions).
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

  /** Per-document sorted 60-bit hash sets of the distinct n-gram
    * shingles — the shared basis of the Jaccard and MinHash paths (one
    * md5 pass per shingle, total). Sets of hashes stand in for sets of
    * shingles (60-bit collisions are negligible and the SQL oracle
    * replays the identical hashing, so results stay comparable). */
  def hashedShingleSets(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      call_function("hashed_shingles", tokens(col(textCol)), lit(n))
        .as("hs"))
      .withColumn("n_sh", size(col("hs")))
      .filter(col("n_sh") > 0)

  /** The declarative formulation of [[hashedShingleSets]]'s hash column —
    * bit-identical; kept as the native expression's cross-check. */
  def hashedShinglesDeclarative(text: Column, n: Int): Column =
    array_sort(transform(shingles(text, n), s => hash60(s)))

  /** One-pass combined signature frame for pipelines that run BOTH the
    * MinHash and SimHash paths over the same corpus (e.g. the composed
    * corpus clean): tokenization happens once and both signatures are
    * computed in the same projection, so a caller can persist this one
    * frame (id + the doc's shingle-hash set + one 64-bit sig — the hash
    * set is comparable to the text in bytes, but tokenize + md5 run
    * ONCE instead of once per path) and feed [[minhashDedupPairsFromSets]] and
    * [[simhashPairsBlockedFromSigs]] from it instead of re-scanning and
    * re-tokenizing the documents per path. Unlike [[hashedShingleSets]]
    * this does NOT drop shingle-less docs — the SimHash path keeps every
    * doc; the MinHash consumers filter `n_sh > 0` themselves. */
  def textSignatures(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame =
    docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("_toks"))
      .select(col("doc_id"),
        call_function("hashed_shingles", col("_toks"), lit(n)).as("hs"),
        call_function("simhash60", col("_toks")).as("sig"))
      .withColumn("n_sh", size(col("hs")))

  private def intersectCount(a: Column, b: Column): Column =
    call_function("sorted_intersect_count", a, b)

  /** Exact-Jaccard verification of candidate pairs `(a, b)` against a
    * `(doc_id, hs, n_sh)` set frame — the shared tail of every LSH
    * path, also fed by [[IncrementalDedup]] with a store-pruned set
    * frame. */
  def jaccardVerify(cands: DataFrame, sets: DataFrame,
      threshold: Double): DataFrame =
    cands
      .join(sets.select(col("doc_id").as("a"), col("hs").as("hsa"),
        col("n_sh").as("na")), Seq("a"))
      .join(sets.select(col("doc_id").as("b"), col("hs").as("hsb"),
        col("n_sh").as("nb")), Seq("b"))
      .withColumn("common", intersectCount(col("hsa"), col("hsb")))
      .withColumn("jaccard",
        col("common") / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))

  /** Exact pairwise n-gram Jaccard ≥ `threshold` via prefix filtering:
    * index only each doc's ⌊(1−t)·|A|⌋+1 smallest hashes; any pair at or
    * above the threshold is guaranteed to collide on the prefix index
    * (recall 1), then exact Jaccard verifies on the full sorted sets. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8): DataFrame = {
    // the sets feed the posting index AND both verify joins; the shared
    // pass is one fused native kernel, so recomputation is cheaper than
    // holding cache blocks for the job's lifetime (callers running many
    // dedup jobs in one session may persist docs themselves)
    val sets = hashedShingleSets(docs, idCol, textCol, n)
    val prefixLen =
      (floor(lit(1.0 - threshold) * col("n_sh")) + 1).cast("int")
    val posting = sets.select(col("doc_id"),
      explode(slice(col("hs"), lit(1), prefixLen)).as("h"))
    val cands = posting.as("x")
      .join(posting.as("y"),
        col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    jaccardVerify(cands, sets, threshold)
  }

  /** Containment near-dup pairs: C(A,B) = |A∩B| / |A| ≥ `threshold`,
    * over distinct n-gram shingle-hash sets — the asymmetric companion
    * to [[ngramJaccardPairs]]. Jaccard misses the doc-inside-doc case
    * (a page quoted whole inside a much longer page scores
    * |A|/|B| ≈ 0 Jaccard but containment 1), which is the shape
    * boilerplate injection and scraper wrapping actually take in web
    * corpora (Broder, "On the resemblance and containment of
    * documents", SEQUENCES'97 — the containment half).
    *
    * Prefix filtering still applies on the CONTAINED side only: if
    * C(A,B) ≥ t then fewer than (1−t)·|A|+1 of A's hashes miss B, so A's
    * ⌊(1−t)·|A|⌋+1 smallest hashes must hit B somewhere — but B is
    * unconstrained (any superset matches), so the B side indexes ALL its
    * hashes. Recall is exactly 1; the index is ids+hashes only (the same
    * O(corpus tokens) row count as the positioned index in
    * [[duplicateSpans]], never text), and the verify tail is the shared
    * fused-kernel exact intersection. Emits (a, b, containment) with
    * a ≠ b, a the contained doc — both directions can fire for mutual
    * near-copies, which downstream cluster resolution collapses.
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sets = hashedShingleSets(docs, idCol, textCol, n)
    val prefixLen =
      (floor(lit(1.0 - threshold) * col("n_sh")) + 1).cast("int")
    val prefix = sets.select(col("doc_id"),
      explode(slice(col("hs"), lit(1), prefixLen)).as("h"))
    val full = sets.select(col("doc_id"), explode(col("hs")).as("h"))
    val cands = prefix.as("x")
      .join(full.as("y"),
        col("x.h") === col("y.h") && col("x.doc_id") =!= col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    cands
      .join(sets.select(col("doc_id").as("a"), col("hs").as("hsa"),
        col("n_sh").as("na")), Seq("a"))
      .join(sets.select(col("doc_id").as("b"), col("hs").as("hsb")),
        Seq("b"))
      .withColumn("containment",
        intersectCount(col("hsa"), col("hsb")) / col("na"))
      .filter(col("containment") >= threshold)
      .select(col("a"), col("b"), col("containment"))
  }

  /** LSH candidate pairs: split the k-wide MinHash signature into `bands`
    * bands of k/bands rows; docs agreeing on any full band collide.
    * Returns distinct (a, b) with a < b. The join key is (band index,
    * joined band values) — one shuffle, no quadratic scan. */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 16, bands: Int = 4): DataFrame = {
    require(k % bands == 0, s"k=$k not divisible by bands=$bands")
    minhashCandidatesFromSets(
      hashedShingleSets(docs, idCol, textCol, n), k, bands)
  }

  private def minhashCandidatesFromSets(sets: DataFrame, k: Int,
      bands: Int): DataFrame = {
    val r = k / bands
    val sigs = sets.withColumn("sig",
      call_function("minhash_sig", col("hs"), lit(k)))
    val banded = sigs.select(
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
    * tiny relative to the corpus). */
  def minhashDedupPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 16, bands: Int = 4,
      threshold: Double = 0.8): DataFrame = {
    val sets = hashedShingleSets(docs, idCol, textCol, n)
    jaccardVerify(minhashCandidatesFromSets(sets, k, bands), sets,
      threshold)
  }

  /** [[minhashDedupPairs]] over a pre-built `(doc_id, hs, n_sh)` frame
    * (e.g. a persisted [[textSignatures]]); applies the `n_sh > 0`
    * filter [[hashedShingleSets]] would have applied. */
  def minhashDedupPairsFromSets(sets: DataFrame, k: Int = 16,
      bands: Int = 4, threshold: Double = 0.8): DataFrame = {
    require(k % bands == 0, s"k=$k not divisible by bands=$bands")
    val s = sets.select(col("doc_id"), col("hs"), col("n_sh"))
      .filter(col("n_sh") > 0)
    jaccardVerify(minhashCandidatesFromSets(s, k, bands), s, threshold)
  }

  /** 60-bit SimHash over whitespace tokens, one fused native pass
    * ([[graft.functions.expr.SimHash60]]). */
  def simhash(text: Column): Column =
    call_function("simhash60", tokens(text))

  /** The declarative formulation (60 aggregate folds) — bit-identical to
    * [[simhash]]; kept as the cross-check for the native expression. */
  def simhashDeclarative(text: Column, bits: Int = 60): Column = {
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
    * shape: corpus self-join (the oracle path). For scale, use
    * [[simhashPairsBlocked]]. */
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
      maxDist: Int = 3): DataFrame =
    simhashPairsBlockedFromSigs(
      docs.select(col(idCol).as("doc_id"), simhash(col(textCol)).as("sig")),
      maxDist)

  /** [[simhashPairsBlocked]] over a pre-built `(doc_id, sig)` frame
    * (e.g. a persisted [[textSignatures]]). */
  def simhashPairsBlockedFromSigs(sigFrame: DataFrame,
      maxDist: Int = 3): DataFrame = {
    val sigs = sigFrame.select(col("doc_id"), col("sig"))
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

  /** Global line-level exact dedup (C4's "discard all but one of any
    * repeated three-sentence span" policy at line granularity, Raffel
    * et al. 2020): every distinct normalized line is kept ONCE
    * corpus-wide — the occurrence with the lowest (doc, position) — and
    * each document is recomposed from its surviving lines in order.
    *
    * Shape for 100 TB:
    *   1. winner election shuffles (fingerprint, doc, pos) triples only
    *      — `min(struct)` is associative, so map-side partial
    *      aggregation collapses each partition's postings before the
    *      shuffle and line TEXT never rides the fingerprint shuffle;
    *   2. the winner set joins back on (doc, pos) — one equi-join — and
    *      recomposition groups on doc_id, the corpus's natural key.
    *
    * @return one row per document:
    *         (doc_id, n_lines, n_kept, clean_text — null if nothing kept)
    */
  def dedupLines(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    import graft.functions.TextClean
    val positioned = docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(TextClean.docLines(col(textCol))).as(Seq("pos", "line")))
      .withColumn("_fp", fingerprint(col("line")))
    val winners = positioned
      .groupBy(col("_fp"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("w"))
      .select(col("w.doc_id").as("doc_id"), col("w.pos").as("pos"))
    val perDoc = positioned
      .join(winners, Seq("doc_id", "pos"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")), "\n").as("clean_text"))
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        size(TextClean.docLines(col(textCol))).as("n_lines"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"), col("clean_text"))
  }

  /** Substring-level duplicate-SPAN detection (the exact-substring dedup
    * of Lee et al. 2021, "Deduplicating Training Data Makes Language
    * Models Better", arXiv:2107.06499, at word-n-gram granularity): a
    * token position is "duplicated" when some n-gram covering it also
    * appears in at least `minDocs` distinct documents; maximal runs of
    * duplicated positions are reported as spans, per document.
    *
    * Shape for 100 TB (the suffix-array of the paper is replaced by a
    * shuffle-friendly inverted index):
    *   1. one scan emits (doc, pos, hash60(n-gram)) — text never leaves
    *      the scan;
    *   2. the duplicated-hash table is a groupBy on the hash (bounded by
    *      distinct shingles, not corpus size) — the ONLY wide shuffle;
    *   3. positions join back on the hash (equi-join on the same key, so
    *      the shuffle is reused), and span assembly is a per-document
    *      window — partitioned by doc_id, never global.
    *
    * @return (doc_id, span_start, span_end, span_len) — token indices,
    *         0-based inclusive; documents with no duplicated span are
    *         absent.
    */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Int = 2): DataFrame = {
    require(n >= 1, s"ngram n=$n must be >= 1")
    require(minDocs >= 2, s"minDocs=$minDocs must be >= 2")
    val toks = tokens(col(textCol))
    // (doc, pos, h): position-carrying shingle hashes — unlike
    // hashedShingleSets, duplicates are NOT collapsed (each position
    // must keep its own verdict)
    val positioned = docs
      .select(col(idCol).cast("long").as("doc_id"), toks.as("_toks"))
      .filter(size(col("_toks")) >= n)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("_toks")) - lit(n - 1)),
        i => struct((i - 1).as("pos"),
          hash60(concat_ws(" ",
            (0 until n).map(j => element_at(col("_toks"), i + lit(j))): _*))
            .as("h")))).as("s"))
      .select(col("doc_id"), col("s.pos").as("pos"), col("s.h").as("h"))
    val dupHashes = positioned
      .groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("_nd"))
      .filter(col("_nd") >= minDocs)
      .select(col("h"))
    val covered = positioned.join(dupHashes, Seq("h"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("p"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("p"))
    covered
      .withColumn("_g", col("p") - row_number().over(w))
      .groupBy(col("doc_id"), col("_g"))
      .agg(min(col("p")).as("span_start"), max(col("p")).as("span_end"),
        count(lit(1)).as("span_len"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        col("span_len"))
  }
}
