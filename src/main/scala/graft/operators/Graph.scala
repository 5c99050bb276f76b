package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph centrality over corpus-scale node sets — the
  * missing-capability class between the one-shot pair operators
  * ([[Dedup]]) and the O(log n) connected components
  * ([[Clustering]]): a fixed number of synchronous rank-propagation
  * rounds (PageRank, Brin & Page 1998). A training-data pipeline uses
  * it to rank documents by centrality inside near-duplicate /
  * citation / link graphs (e.g. keep the most-linked copy of a dup
  * cluster, weight crawl frontiers).
  *
  * Determinism: ranks live in integer micro-units (node mass 1e6).
  * Each round is `rank' = teleport + damping · Σ_in (rank ÷ out_deg)`
  * with INTEGER division at both the contribution split and the
  * damping product — every intermediate is an exact integer, so the
  * result is identical in any engine, any partitioning, any summation
  * order, and a DuckDB oracle replays all K rounds as chained CTEs.
  * (Float PageRank would diverge across engines in the sum order;
  * the deterministic floor here loses < 1 micro-unit per edge per
  * round — irrelevant for ranking, essential for replay.)
  *
  * Scale shape: each round is ONE join of the edge list against the
  * rank table on `src` (both hash-partitioned on the join key — AQE
  * reuses the exchange layout across rounds) plus one `dst`-keyed
  * aggregate with map-side combine; nothing ever materializes beyond
  * |edges| rows. The out-degree join is precomputed once and the
  * edge frame persisted across all K rounds. Driver sees nothing.
  * For K ≫ 10 rounds, localCheckpoint the rank frame every few rounds
  * to truncate lineage (the K=5 plan here composes fine without). */
object Graph {

  /** K synchronous PageRank rounds over `edges (src, dst)` with node
    * universe `nodes (id)` — isolated nodes settle at the teleport
    * mass, dangling nodes leak their mass (the standard simplified
    * treatment, deterministic here). Returns `(id, rank)` in integer
    * micro-units. */
  def pageRank(nodes: DataFrame, edges: DataFrame, iterations: Int = 5,
      dampingPercent: Int = 85): DataFrame = {
    require(iterations >= 1, "pageRank: iterations must be >= 1")
    require(dampingPercent >= 0 && dampingPercent <= 100,
      "pageRank: dampingPercent must be in [0, 100]")
    val unit = 1000000L
    val teleport = unit * (100 - dampingPercent) / 100
    val deg = edges.groupBy("src").agg(count(lit(1)).as("_deg"))
    // (src, dst, _deg) — scanned once per round, persist across rounds
    val e = edges.join(deg, "src").persist()
    try {
      var rank = nodes.select(col("id"), lit(unit).as("rank"))
      for (_ <- 1 to iterations) {
        val contrib = e
          .join(rank.withColumnRenamed("id", "src"), "src")
          .select(col("dst").as("id"), expr("rank div _deg").as("_c"))
          .groupBy("id").agg(sum(col("_c")).as("_s"))
        rank = nodes.join(contrib, Seq("id"), "left")
          .select(col("id"),
            expr(s"$teleport + ($dampingPercent * coalesce(_s, 0)) div 100")
              .as("rank"))
      }
      // materialize before releasing the edge cache (repo convention:
      // the caller must never observe a plan over unpersisted blocks)
      rank.localCheckpoint()
    } finally e.unpersist(false)
  }

  /** Undirected view of a pair list: each `(a, b)` becomes edges both
    * ways. */
  def symmetrize(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
}
