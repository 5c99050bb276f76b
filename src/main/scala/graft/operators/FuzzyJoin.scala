package graft.operators

import graft.Frontier._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity join (entity resolution): all pairs
  * `(l, r)` with `levenshtein(l.str, r.str) <= maxDist`, EXACT — the
  * fuzzy-match companion to [[Dedup.ngramJaccardPairs]]' set-overlap
  * join, for keys where tokens don't exist (names, addresses, SKUs).
  *
  * Scale design (the 100 TB story): never the cross product. Candidates
  * come from an Ed-Join-style prefix-filtered q-gram inverted index
  * (Xiao, Wang & Lin, VLDB 2008):
  *
  *   - One edit changes at most `q` of a string's q-grams, so
  *     `ed(s,t) <= k` forces the occurrence-numbered gram SETS to agree
  *     on all but `k*q` elements per side (occurrence numbering turns
  *     the multiset bound into a set bound).
  *   - Prefix-filter lemma: under ANY global total order, two sets each
  *     missing at most `p` of the other must collide within their
  *     `p + 1` smallest elements. So each string indexes only its
  *     `k*q + 1` smallest (gram, occ) pairs under Ed-Join's
  *     frequency-ascending order (rarest grams first, computed over
  *     both sides) — which steers every prefix toward discriminative
  *     grams, so near-duplicate families never flood one posting list
  *     — and the candidate join touches prefix postings only, never
  *     the full gram table.
  *   - Strings too short for the lemma to bite (a pair can evade the
  *     prefix collision only when BOTH gram sets have size <= `k*q`)
  *     fall into a brute bucket — which is therefore closed:
  *     short x short, never short x corpus — and the brute cross runs
  *     over DISTINCT short strings (an alphabet-bounded space) with
  *     output-sized re-expansion to ids, never over rows.
  *
  * Verification is the real `levenshtein` behind a length pre-filter
  * (`| |s|-|t| | <= k` is implied by `ed <= k`), so precision is exact
  * and recall is the two lemmas above — spec-proven equal to the
  * quadratic join. */
object FuzzyJoin {

  /** All `s` grams as (g, occ) structs — `occ` numbers repeated grams
    * so duplicates survive set semantics. Empty array when `|s| < q`.
    * `(g, occ)` pairs are distinct within one string by construction. */
  private def gramSet(s: Column, q: Int): Column = {
    val n = length(s) - q + 1
    val grams = when(n >= 1,
      transform(sequence(lit(1), n), i => s.substr(i, lit(q))))
      .otherwise(array().cast("array<string>"))
    transform(grams, (g, i) => {
      val occ = size(filter(slice(grams, lit(1), i), x => x === g))
      struct(g.as("g"), occ.as("occ"))
    })
  }

  /** One exploded (id, g, occ) row per gram of each string. */
  private def allGrams(df: DataFrame, idCol: String, strCol: String,
      q: Int, side: String): DataFrame =
    df.select(col(idCol).as(s"${side}_id"), col(strCol).as(s"${side}_s"))
      .filter(col(s"${side}_s").isNotNull)
      .select(col(s"${side}_id"),
        explode(gramSet(col(s"${side}_s"), q)).as("e"))
      .select(col(s"${side}_id"), col("e.g"), col("e.occ"))

  /** Prefix posting list: each string's `k*q + 1` RAREST (gram, occ)
    * pairs under the corpus-wide document-frequency order (`dfreq`,
    * ties by (g, occ)) — Ed-Join's frequency-ascending prefix. The
    * order matters enormously in practice: a frequency-oblivious
    * (hashed) order lets every member of a large near-duplicate family
    * index the family's shared grams, and the candidate join goes
    * quadratic in the family size; rarest-first pushes each string's
    * prefix toward its DISCRIMINATIVE grams, so hot posting lists
    * never form. Any global total order preserves the recall lemma. */
  private def posting(grams: DataFrame, side: String, k: Int, q: Int,
      dfreq: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(s"${side}_id"))
      .orderBy(col("_df"), col("g"), col("occ"))
    grams
      // left join: a gram absent from dfreq (impossible when dfreq is
      // built over both sides, defensive otherwise) ranks rarest
      .join(dfreq, Seq("g", "occ"), "left")
      .na.fill(1L, Seq("_df"))
      // explicit hash layout on the window key: it satisfies the
      // window's required distribution (no second exchange) and, being
      // user-specified, AQE does not coalesce it — without this the
      // per-id sort of the full gram table lands on ONE post-shuffle
      // partition (advisory-size coalescing) and runs serial
      .repartition(grams.sparkSession.sparkContext.defaultParallelism,
        col(s"${side}_id"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k * q + 1)
      .select(col(s"${side}_id"), col("g"), col("occ"))
  }

  /** Candidate pair ids BEFORE exact verification — the prefix-filtered
    * gram-join candidates plus the closed short bucket. Public so the
    * scale harness can gate candidate volume (~linear in data) without
    * re-deriving the index. */
  def candidatePairs(left: DataFrame, leftId: String, leftStr: String,
      right: DataFrame, rightId: String, rightStr: String,
      maxDist: Int, q: Int = 3): DataFrame =
    rawCandidatePairs(left, leftId, leftStr, right, rightId, rightStr,
      maxDist, q).distinct()

  /** [[candidatePairs]] WITHOUT the final distinct — a pair can appear
    * once per colliding prefix gram (multiplicity ≤ prefix size, and
    * measured ~1.07× on the gated corpus). [[join]] verifies this raw
    * stream and dedups the MATCH output instead: the threshold-banded
    * verify costs less per extra duplicate than a full exchange + hash
    * aggregate of the multi-million-row candidate set (guide §2.4 —
    * "a distinct on data that is already [nearly] unique"). */
  private def rawCandidatePairs(left: DataFrame, leftId: String,
      leftStr: String, right: DataFrame, rightId: String,
      rightStr: String, maxDist: Int, q: Int = 3): DataFrame = {
    val k = maxDist
    // Each skinny intermediate below is materialized once (eager local
    // checkpoint; blocks release with the RDD): the gram tables feed
    // both the frequency aggregate and their posting window, the
    // frequency table feeds both posting sides, and the postings feed
    // the candidate join — left lazy, the O(L²)-per-string gram
    // expression would re-evaluate at every consumer. At corpus scale
    // you materialize the (id, gram) table once for the same reason.
    // fan the inputs out before the gram explode: the occurrence-
    // numbered gramSet expression is O(L²) per string — real per-row
    // CPU that would otherwise run on however few splits the input
    // arrives in (one, for the testdata parquet)
    val dp = left.sparkSession.sparkContext.defaultParallelism
    val lg = allGrams(left.repartition(dp), leftId, leftStr, q, "l")
      .frontier
    val rg = allGrams(right.repartition(dp), rightId, rightStr, q, "r")
      .frontier
    // corpus-wide (gram, occ) document frequency over BOTH sides — the
    // global prefix order. Gram-keyed aggregate, output bounded by the
    // distinct-gram vocabulary, never by row count.
    val dfreq = lg.select(col("g"), col("occ"))
      .unionAll(rg.select(col("g"), col("occ")))
      .groupBy(col("g"), col("occ"))
      .agg(count(lit(1)).as("_df"))
      .frontier
    val lp = posting(lg, "l", k, q, dfreq).frontier
    val rp = posting(rg, "r", k, q, dfreq).frontier
    // explicit hash layout on the join key: the posting tables are
    // tiny in BYTES (k·q+1 rows per string), so AQE's advisory-size
    // coalescing would run this join on ONE partition — but its cost
    // is the per-gram candidate blowup (hot posting lists), real CPU
    // that needs the fan-out. User-specified partitioning both
    // satisfies the join requirement and is exempt from coalescing.
    val gramCands = lp.repartition(dp, col("g"), col("occ"))
      .join(rp.repartition(dp, col("g"), col("occ")), Seq("g", "occ"))
      .select(col("l_id"), col("r_id"))

    // short bucket: the prefix lemma's proof needs ONE side to hold
    // k*q + 1 grams, so a pair can evade only when BOTH gram sets have
    // size <= k*q (|s| <= k*q + q - 1) — the bucket is closed over
    // shorts by construction, never short x corpus. The cross product
    // runs over DISTINCT short strings — a space bounded by the
    // alphabet (<= Σ_{l<=shortLen} |Σ|^l), independent of row count —
    // never over rows: a row-level cross is quadratic in the ROW count
    // on duplicate-heavy short corpora (person names, SKUs at
    // maxDist=1/q=3 ⇒ strings <= 5 chars). String pairs are
    // distance-verified at the distinct grain (edit distance is a
    // function of the strings, so every id pair inherits the exact
    // verdict), which makes the id re-expansion joins match-output-
    // sized rather than |shortL|·|shortR|-sized.
    val shortLen = k * q + q - 1
    val ls = left.select(col(leftId).as("l_id"), col(leftStr).as("l_s"))
      .filter(col("l_s").isNotNull && length(col("l_s")) <= shortLen)
    val rs = right.select(col(rightId).as("r_id"), col(rightStr).as("r_s"))
      .filter(col("r_s").isNotNull && length(col("r_s")) <= shortLen)
    val shortStrPairs = ls.select(col("l_s")).distinct()
      .crossJoin(rs.select(col("r_s")).distinct())
      .filter(abs(length(col("l_s")) - length(col("r_s"))) <= k &&
        levenshtein(col("l_s"), col("r_s"), k) >= 0)
    val shortCands = shortStrPairs
      .join(ls, Seq("l_s")).join(rs, Seq("r_s"))
      .select(col("l_id"), col("r_id"))

    gramCands.unionByName(shortCands)
  }

  /** The fuzzy join. `left`/`right` must expose distinct id column
    * names; output is `(leftId, rightId, dist)` with
    * `dist = levenshtein <= maxDist`, exactly the quadratic join's
    * pairs. `q` trades index size (q·k+1 postings per string) against
    * gram selectivity. */
  def join(left: DataFrame, leftId: String, leftStr: String,
      right: DataFrame, rightId: String, rightStr: String,
      maxDist: Int, q: Int = 3): DataFrame = {
    require(leftId != rightId,
      "fuzzy join output needs distinct id column names")
    val k = maxDist
    val cands = rawCandidatePairs(left, leftId, leftStr, right, rightId,
      rightStr, maxDist, q)
    // explicit hash layout for the verify join, same rationale as the
    // candidate join above: the pair frame is tiny in BYTES, so AQE's
    // advisory-size coalescing runs the whole levenshtein verification
    // on ONE post-shuffle partition (measured: six serialized
    // single-task 0.5-0.75 s stages in entity_resolution) — but the
    // verify cost is per-PAIR CPU that needs the fan-out. The id joins
    // reuse this user-specified partitioning on their own keys.
    val dp = left.sparkSession.sparkContext.defaultParallelism
    cands
      .repartition(dp, col("l_id"))
      .join(left.select(col(leftId).as("l_id"),
        col(leftStr).as("l_s")), Seq("l_id"))
      .repartition(dp, col("r_id"))
      .join(right.select(col(rightId).as("r_id"),
        col(rightStr).as("r_s")), Seq("r_id"))
      .filter(abs(length(col("l_s")) - length(col("r_s"))) <= k)
      // banded threshold levenshtein (Spark 3.5+): O(k·L) per pair
      // instead of the O(L²) full DP — the verify is per-candidate CPU
      // over millions of pairs, and at k=1 the band is ~20× narrower
      // (measured: the 63 s verify stage of entity_resolution collapses
      // to ~4 s). Returns −1 above the threshold and the EXACT distance
      // at or below it, so kept rows carry identical `dist` values.
      .withColumn("dist", levenshtein(col("l_s"), col("r_s"), k))
      .filter(col("dist") >= 0)
      .select(col("l_id").as(leftId), col("r_id").as(rightId), col("dist"))
      // candidate multiplicity (raw stream above) collapses HERE, on
      // the match-sized output — orders of magnitude smaller than the
      // candidate set (`dist` is a function of the pair, so this is a
      // pure pair dedup)
      .distinct()
  }
}
