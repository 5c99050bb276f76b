package graft.operators

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
  *     `k*q + 1` smallest (gram, occ) pairs — hash order, so the index
  *     is deterministic and skew-resistant (no frequent-gram hot
  *     posting list carries a whole string's candidates) — and the
  *     candidate join touches prefix postings only, never the full
  *     gram table.
  *   - Strings too short for the lemma to bite (a pair can evade the
  *     prefix collision only when BOTH gram sets have size <= `k*q`)
  *     fall into a brute bucket — which is therefore closed:
  *     short x short, never short x corpus.
  *
  * Verification is the real `levenshtein` behind a length pre-filter
  * (`| |s|-|t| | <= k` is implied by `ed <= k`), so precision is exact
  * and recall is the two lemmas above — spec-proven equal to the
  * quadratic join. */
object FuzzyJoin {

  /** All `s` grams as (h, g, occ) structs — `occ` numbers repeated
    * grams so duplicates survive set semantics, `h` = md5(g:occ) is the
    * global prefix order. Empty array when `|s| < q`. */
  private def gramSet(s: Column, q: Int): Column = {
    val n = length(s) - q + 1
    val grams = when(n >= 1,
      transform(sequence(lit(1), n), i => s.substr(i, lit(q))))
      .otherwise(array().cast("array<string>"))
    transform(grams, (g, i) => {
      val occ = size(filter(slice(grams, lit(1), i), x => x === g))
      struct(md5(concat(g, lit(":"), occ.cast("string"))).as("h"),
        g.as("g"), occ.as("occ"))
    })
  }

  /** Prefix posting list: the `k*q + 1` hash-smallest (gram, occ) pairs
    * per string. */
  private def posting(df: DataFrame, idCol: String, strCol: String,
      q: Int, k: Int, side: String): DataFrame =
    df.select(col(idCol).as(s"${side}_id"), col(strCol).as(s"${side}_s"))
      .filter(col(s"${side}_s").isNotNull)
      .select(col(s"${side}_id"),
        explode(slice(array_sort(gramSet(col(s"${side}_s"), q)),
          1, k * q + 1)).as("e"))
      .select(col(s"${side}_id"), col("e.g"), col("e.occ"))

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
    val lp = posting(left, leftId, leftStr, q, k, "l")
    val rp = posting(right, rightId, rightStr, q, k, "r")
    val gramCands = lp.join(rp, Seq("g", "occ"))
      .select(col("l_id"), col("r_id")).distinct()

    // short bucket: the prefix lemma's proof needs ONE side to hold
    // k*q + 1 grams, so a pair can evade only when BOTH gram sets have
    // size <= k*q (|s| <= k*q + q - 1) — the bucket is closed over
    // shorts by construction, never short x corpus
    val shortLen = k * q + q - 1
    val ls = left.select(col(leftId).as("l_id"), col(leftStr).as("l_s"))
      .filter(col("l_s").isNotNull && length(col("l_s")) <= shortLen)
    val rs = right.select(col(rightId).as("r_id"), col(rightStr).as("r_s"))
      .filter(col("r_s").isNotNull && length(col("r_s")) <= shortLen)
    val shortCands = ls.crossJoin(rs)
      .select(col("l_id"), col("r_id"))

    val cands = gramCands.unionByName(shortCands).distinct()
    cands
      .join(left.select(col(leftId).as("l_id"),
        col(leftStr).as("l_s")), Seq("l_id"))
      .join(right.select(col(rightId).as("r_id"),
        col(rightStr).as("r_s")), Seq("r_id"))
      .filter(abs(length(col("l_s")) - length(col("r_s"))) <= k)
      .withColumn("dist", levenshtein(col("l_s"), col("r_s")))
      .filter(col("dist") <= k)
      .select(col("l_id").as(leftId), col("r_id").as(rightId), col("dist"))
  }
}
