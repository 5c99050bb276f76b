package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd k-means over embedding columns, in exact
  * integer arithmetic end-to-end.
  *
  * Clustering is the backbone of several training-data operations this
  * engine already ships (IVF partitioning for ANN, semantic dedup,
  * coreset selection); this operator makes the clustering itself a
  * first-class, replayable primitive. The usual obstacle to gating
  * k-means against an external oracle is floating-point accumulation
  * order — parallel centroid sums differ last-ulp between engines and
  * runs. Here every step is exact: vectors are quantized once to
  * offset-positive longs (`round(x·2²⁰) + 2²¹` — the offset keeps all
  * values positive so truncating and flooring division coincide),
  * distances are integer L2, centroid updates are integer sums with
  * integer division. Two runs — or two engines — produce identical
  * assignments bit for bit.
  *
  * Scale shape: assignment is map-only — centroids are driver-side
  * literals baked into one codegen'd expression (argmin over k
  * integer-L2 struct comparisons), so the 100 TB scan never joins or
  * shuffles for it. The update step shuffles only (cid, dim) partial
  * sums: posexplode feeds a hash aggregate whose key space is k·d
  * (512 here), so map-side combine collapses each partition to at most
  * k·d rows before the exchange. Driver traffic per iteration is one
  * k·d long matrix. */
object Kmeans {

  /** Exact quantization: `round(x · scale) + offset` per component,
    * as longs. `offset` must exceed `scale · max|x|` so every
    * quantized value is positive. */
  def quantize(vec: Column, scale: Int = 1048576,
      offset: Long = 2097152L): Column =
    transform(vec.cast("array<double>"),
      v => round(v * scale).cast("long") + offset)

  /** Nearest-centroid assignment as a single no-shuffle expression:
    * adds `cid`. Ties break to the lowest cid (struct ordering on
    * (dist, cid)). */
  def assign(df: DataFrame, qCol: String,
      centroids: Seq[(Int, Seq[Long])]): DataFrame = {
    require(centroids.nonEmpty, "assign: no centroids")
    val cands = centroids.map { case (cid, c) =>
      val carr = array(c.map(lit): _*)
      struct(
        aggregate(
          zip_with(col(qCol), carr, (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("dist"),
        lit(cid).as("cid"))
    }
    df.withColumn("_best", array_min(array(cands: _*)))
      .withColumn("cid", col("_best").getField("cid"))
      .drop("_best")
  }

  /** Integer centroid update: per-(cluster, dim) exact sums, truncating
    * division by the member count (== floor: all values positive).
    * Clusters that lost every member disappear — k shrinks rather than
    * resurrecting an arbitrary point. */
  def updateCentroids(assigned: DataFrame, qCol: String,
      cidCol: String = "cid"): Seq[(Int, Seq[Long])] =
    assigned
      .select(col(cidCol), posexplode(col(qCol)).as(Seq("pos", "qv")))
      .groupBy(col(cidCol), col("pos"))
      .agg(sum(col("qv")).as("s"), count(lit(1)).as("n"))
      .select(col(cidCol), col("pos"), expr("s div n").as("cv"))
      .collect()
      .groupBy(_.getInt(0))
      .toSeq
      .map { case (cid, rows) =>
        cid -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
      }
      .sortBy(_._1)

  /** `iters` Lloyd rounds from the k lowest-id vectors; returns the
    * final assignment `(idCol, q, cid)`. The returned frame still
    * carries the quantized vector so callers can aggregate exactly. */
  def fit(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int): DataFrame = {
    require(k > 0 && iters > 0, "fit: k and iters must be positive")
    val q = vecs.select(col(idCol), quantize(col(vecCol)).as("q"))
    var centroids: Seq[(Int, Seq[Long])] =
      q.orderBy(col(idCol)).limit(k).collect()
        .zipWithIndex
        .map { case (r, i) => i -> r.getSeq[Long](1).toSeq }
    var assigned = assign(q, "q", centroids)
    (2 to iters).foreach { _ =>
      centroids = updateCentroids(assigned, "q")
      assigned = assign(q, "q", centroids)
    }
    assigned
  }
}
