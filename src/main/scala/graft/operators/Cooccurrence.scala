package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Co-occurrence mining over (group, item) observations — the
  * association-signal backbone of recommendation/feature pipelines
  * (word2vec-style PMI, market-basket lift, session co-click graphs).
  *
  * Scale shape: ONE shuffle of the distinct (group, item) pairs keyed
  * by group; per-group state is bounded by the item vocabulary (the
  * sorted item set), pair expansion is |items_g|² per group — bounded
  * by vocab², not by row count — and the final pair aggregate runs over
  * the vocab²-bounded key space with map-side combine. A self-join
  * formulation would instead shuffle the observation table twice and
  * build an O(rows²/groups) join; this one never touches raw rows after
  * the first distinct. All counts are exact integers, so the PMI table
  * replays bit-identically in any engine (per-row `ln` on exact-integer
  * ratios, the repo's text_lm_score convention).
  */
object Cooccurrence {

  /** Per-group sorted distinct item sets — the ONE reduction of the
    * observation table everything else derives from. */
  private def itemSets(df: DataFrame, groupCol: String,
      itemCol: String): DataFrame =
    df.select(col(groupCol).as("_g"), col(itemCol).as("_i")).distinct()
      .groupBy("_g").agg(sort_array(collect_set(col("_i"))).as("_is"))

  /** All (i, j) with i < j from the sorted per-group item set — a
    * nested transform + flatten, scan-local after the group agg. */
  private def pairCountsFromSets(sets: DataFrame): DataFrame = {
    val pairs = flatten(transform(col("_is"), (x, i) =>
      transform(slice(col("_is"), i + lit(2), size(col("_is"))),
        y => struct(x.as("a"), y.as("b")))))
    sets.select(explode(pairs).as("_p"))
      .select(col("_p.a").as("a"), col("_p.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_pair"))
  }

  /** Ordered within-group item pairs `(a < b, n_pair)`: groups with
    * both items, counted once per group regardless of repetition. */
  def pairCounts(df: DataFrame, groupCol: String,
      itemCol: String): DataFrame =
    pairCountsFromSets(itemSets(df, groupCol, itemCol))

  /** Pointwise mutual information per co-occurring item pair:
    * `(a, b, n_pair, n_a, n_b, pmi)` with
    * `pmi = ln(n_pair · N / (n_a · n_b))` rounded to 6 decimals —
    * positive when the pair co-occurs more than independent presence
    * would predict. `N` = number of groups; all inputs exact integers.
    *
    * The observation table is scanned ONCE: pair counts, item counts,
    * and the group count all derive from the persisted groups-sized
    * set frame (plan-audited — the naive form re-ran the distinct
    * chain four times). Result is localCheckpoint'd before the cache
    * is released (repo cache-lifecycle convention). */
  def pmi(df: DataFrame, groupCol: String, itemCol: String,
      minPair: Long = 1L): DataFrame = {
    val sets = itemSets(df, groupCol, itemCol).persist()
    try {
      val itemCounts = sets.select(explode(col("_is")).as("_i"))
        .groupBy(col("_i")).agg(count(lit(1)).as("c"))
      val nGroups = sets.select(count(lit(1)).as("n"))
      pairCountsFromSets(sets)
        .filter(col("n_pair") >= minPair)
        .join(broadcast(itemCounts.select(col("_i").as("a"),
          col("c").as("n_a"))), "a")
        .join(broadcast(itemCounts.select(col("_i").as("b"),
          col("c").as("n_b"))), "b")
        .crossJoin(broadcast(nGroups))
        .select(col("a"), col("b"), col("n_pair"), col("n_a"),
          col("n_b"),
          round(log(col("n_pair").cast("double") * col("n") /
            (col("n_a") * col("n_b"))), 6).as("pmi"))
        .localCheckpoint()
    } finally sets.unpersist(false)
  }
}
