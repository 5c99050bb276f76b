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

  /** Exact triangle listing over an undirected pair set, with the
    * degree orientation that makes it survive skew (Suri &
    * Vassilvitskii 2011): every edge is directed from its
    * lower-(degree, id) endpoint, so a hub of degree d generates
    * wedges only among its HIGHER-ranked neighbors — the per-vertex
    * wedge count is bounded by the arboricity-style √|E| argument
    * instead of d², which is what kills the naive a<b orientation on
    * power-law graphs. Each triangle is emitted exactly once (its
    * vertices in rank order), so the triangle SET is
    * orientation-independent — an oracle using the naive formulation
    * matches row-for-row.
    *
    * Shape: one degree aggregate, two degree-attach joins, one wedge
    * self-join on the shared LOW vertex, one closing-edge left-semi
    * join. Nothing materializes beyond the wedge set the orientation
    * already minimized.
    *
    * @return `(x, y, z)` triangles, vertices in rank order. */
  def triangles(pairs: DataFrame, aCol: String = "a",
      bCol: String = "b"): DataFrame = {
    // canonical undirected edges, defensively deduped
    val und = pairs
      .select(least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val deg = und.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // total order: (degree, id) packed into one comparable struct
    val ranked = und
      .join(deg.withColumnsRenamed(Map("n" -> "u", "d" -> "du")), "u")
      .join(deg.withColumnsRenamed(Map("n" -> "v", "d" -> "dv")), "v")
      .select(col("u"), col("v"),
        struct(col("du").as("d"), col("u").as("n")).as("ru"),
        struct(col("dv").as("d"), col("v").as("n")).as("rv"))
    val dir = ranked
      .select(when(col("ru") < col("rv"),
          struct(col("u").as("lon"), col("v").as("hin"),
            col("rv").as("hir")))
        .otherwise(struct(col("v").as("lon"), col("u").as("hin"),
          col("ru").as("hir"))).as("e"))
      .select(col("e.lon").as("lo"), col("e.hin").as("hi"),
        col("e.hir").as("hir"))
    val e1 = dir.select(col("lo").as("w"), col("hi").as("p"),
      col("hir").as("pr"))
    val e2 = dir.select(col("lo").as("w"), col("hi").as("q"),
      col("hir").as("qr"))
    val wedges = e1.join(e2, "w").filter(col("pr") < col("qr"))
      .select(col("w"), col("p"), col("q"))
    wedges
      .join(dir.select(col("lo").as("p"), col("hi").as("q")),
        Seq("p", "q"), "left_semi")
      .select(col("w").as("x"), col("p").as("y"), col("q").as("z"))
  }

  /** Per-vertex triangle participation `(n, n_tri)` — vertices in no
    * triangle are absent. */
  def triangleCounts(pairs: DataFrame, aCol: String = "a",
      bCol: String = "b"): DataFrame =
    triangles(pairs, aCol, bCol)
      .select(explode(array(col("x"), col("y"), col("z"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("n_tri"))
}
