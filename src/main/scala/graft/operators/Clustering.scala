package graft.operators

import graft.Frontier._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: near-dup pair lists (from Dedup /
  * Similarity) are only half the dedup story — a corpus clean actually
  * needs "group the pairs into clusters and keep ONE doc per cluster".
  * That grouping is connected components over the pair graph.
  *
  * The algorithm is alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14): each round
  * is two per-node star passes — two exchanges total; the carried edge
  * frames MAY hold cross-group duplicate emissions (the round-end
  * distinct is gone since r15) — and the edge set provably converges to
  * per-component stars rooted at the component's minimum node id in
  * O(log n) rounds — not O(diameter) like naive label propagation,
  * which dies on long chains. No all-pairs step, no driver-side graph.
  *
  * Lineage is truncated per round with `localCheckpoint` — iterative
  * plans otherwise nest joins `rounds` deep and analysis/recovery cost
  * explodes. On a real cluster with executor churn, swap for
  * `checkpoint` on a reliable store (same call site, one flag).
  */
object Clustering {

  private val MaxRounds = 50

  /** Stats of the last `connectedComponents` run — test hook proving the
    * exact fixpoint certificate actually executed. */
  private[graft] final case class CcStats(rounds: Int, certified: Boolean)
  @volatile private[graft] var lastStats: CcStats = CcStats(0, certified = false)

  /** Connected components of the undirected pair graph. Input: one row
    * per edge (aCol, bCol); self-loops ignored. Output: (node,
    * component) for every node appearing in an edge, where component =
    * min node id of the component — a deterministic labeling, so the
    * result is engine-reproducible regardless of iteration order.
    *
    * Convergence is detected cheaply by an order- AND duplicate-
    * independent fingerprint (distinct count + distinct hash sum of a
    * derived pair key — see [[checksum]]), then *certified exactly* at
    * the fixpoint only, with a TWO-SIDED `except` (both directions
    * empty). Both sides are required: the carried edge frames may hold
    * duplicates, so a one-sided `exceptAll` would be unsound — do not
    * "simplify" back to it. A fingerprint collision therefore cannot
    * terminate the loop early with wrong labels — the certificate fails
    * and iteration continues. Cost: two anti-joins at the fixpoint, not
    * per round.
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "a",
      bCol: String = "b"): DataFrame = {
    val spark = pairs.sparkSession
    var edges = pairs.select(col(aCol).cast("long").as("u"),
        col(bCol).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .frontier
    var converged = false
    var rounds = 0
    // carried across rounds: round k's `next` checksum IS round k+1's
    // `edges` checksum — recomputing it would double the per-round
    // fingerprint jobs
    var edgesSum = checksum(edges)
    while (!converged && rounds < MaxRounds) {
      // ONE large/small round per materialization. (Measured dead end:
      // double-stepping two rounds per checkpoint — each star
      // references its input in several subtrees, so the un-checkpointed
      // inner round's plan is DUPLICATED multiplicatively into the
      // outer one and the fused iteration ran 2-3× SLOWER than two
      // materialized rounds. The checkpoint per round is load-bearing,
      // not overhead.) The stars themselves are aggregate-based (r14):
      // per-node min + neighbor set in ONE groupBy each, no join-back —
      // and since those aggregates are duplicate-INSENSITIVE (min /
      // collect_set), the round-end distinct is gone too (r15): the
      // carried edge set may hold cross-group duplicate emissions
      // (row count still ≤ E+V per round — rows are generated per
      // (group, set-element) over deduped sets), the convergence
      // fingerprint dedups INSIDE its aggregate, and the fixpoint
      // certificate is exact set equality. 2 exchanges per round where
      // the join-based stars with per-star distincts paid ~6 and the
      // r14 shape paid 3.
      val next = smallStar(largeStar(edges)).frontier
      val nextSum = checksum(next)
      if (nextSum == edgesSum) {
        // exact SET-equality certificate, two-sided: `except` dedups
        // internally, so duplicates in either frame cannot fake (or
        // break) convergence; a fingerprint collision cannot terminate
        // the loop early — both directions must come back empty.
        converged = next.except(edges).isEmpty &&
          edges.except(next).isEmpty
      }
      edges.unpersist()
      edges = next
      edgesSum = nextSum
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $MaxRounds rounds — " +
          "component labels would be wrong; raise MaxRounds or check the input graph")
    lastStats = CcStats(rounds, certified = true)
    // Converged edges are (child, root) stars; roots label themselves.
    edges.select(col("u").as("node"), col("v").as("component"))
      .union(edges.select(col("v").as("node"), col("v").as("component")))
      .groupBy("node").agg(min("component").as("component"))
  }

  /** Attach cluster labels to a corpus and flag the canonical survivor:
    * every doc gets `cluster_id` (its component's min doc id, or its own
    * id when it has no duplicate) and `keep` = (doc_id == cluster_id) —
    * filter on `keep` for the deduplicated corpus. Broadcast-joins the
    * label table when small; at scale both sides hash-join on the id. */
  def canonicalize(docs: DataFrame, pairs: DataFrame,
      idCol: String): DataFrame = {
    val labels = connectedComponents(pairs)
      .withColumnRenamed("node", idCol)
    docs.join(labels, Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("component"), col(idCol)))
      .withColumn("keep", col(idCol) === col("cluster_id"))
      .drop("component")
  }

  /** Large-star: every node connects its strictly-larger neighbors to
    * the minimum of its neighborhood (incl. itself) — one aggregate
    * (min + larger-neighbor set per node), the reconnect falling out
    * scan-locally from the explode, instead of a groupBy-min JOINED
    * back to the symmetrized edges (r15: one exchange, was two-plus-
    * distinct). Memory per group is the node's deduped neighbor set —
    * bounded by the largest component (a near-dup cluster / entity
    * block, small by construction); for graphs with million-member
    * components swap back to the join-based star, which streams. */
  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
    sym.groupBy("u")
      .agg(min(least(col("u"), col("v"))).as("m"),
        collect_set(when(col("v") > col("u"), col("v"))).as("big"))
      .select(explode(col("big")).as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
  }

  /** Small-star: every node connects its smaller-or-equal neighbors
    * (and itself) to the minimum of that set — same aggregate shape as
    * [[largeStar]] (`array_union` splices the node itself into the
    * reconnect set). */
  private def smallStar(edges: DataFrame): DataFrame = {
    val oriented = edges.select(
      greatest(col("u"), col("v")).as("u"),
      least(col("u"), col("v")).as("v"))
    oriented.groupBy("u")
      .agg(min(col("v")).as("m"), collect_set(col("v")).as("vs"))
      .select(explode(array_union(col("vs"), array(col("u")))).as("u"),
        col("m").as("v"))
      .filter(col("u") =!= col("v"))
  }

  /** Order- AND duplicate-independent convergence fingerprint of an
    * edge set: distinct count + distinct hash sum over one derived
    * 64-bit key, so it dedups inside a single two-phase aggregate
    * instead of requiring a materialized `distinct()` of the frame.
    * Used only to DETECT a fixpoint (a hash collision merely delays
    * detection or sends it to the exact certificate, which then fails
    * and iteration continues) — any engine-internal hash is fine. */
  private def checksum(edges: DataFrame): (Long, Long) = {
    // ONE distinct key (the 32-bit pair hash widened to long) for both
    // aggregates — a single two-phase distinct aggregate, no Expand —
    // and the sum of ≤2³¹ distinct int32 values cannot overflow a long
    // under ANSI arithmetic. 32-bit collisions merely conflate a few
    // set elements: both aggregates stay deterministic functions of the
    // edge SET, which is all a fingerprint needs.
    val h = hash(col("u"), col("v")).cast("long")
    val r = edges.agg(count_distinct(h).as("n"),
      coalesce(sum_distinct(h), lit(0L)).as("s"))
      .head()
    (r.getLong(0), r.getLong(1))
  }
}
