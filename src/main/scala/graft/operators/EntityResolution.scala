package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution — the record-linkage composition: a blocked
  * matcher (any pair source; [[FuzzyJoin]] for typo-grade string
  * drift) feeds [[Clustering.connectedComponents]], and each cluster
  * elects one deterministic survivor record. Engine surface the
  * reference leaves to its sinks; here it composes two already-gated
  * operators, so the 100 TB shape is theirs: the matcher is the
  * prefix-filtered candidate join (never quadratic), CC is
  * large-star/small-star in O(log n) rounds, and what follows is one
  * id-keyed join plus a cluster-keyed aggregate.
  *
  * Survivorship is `min_by(name, id)` — the lowest member id's
  * attribute, a total order, so the canonical pick is engine- and
  * partitioning-independent (ties impossible: ids are unique).
  */
object EntityResolution {

  /** One row per resolved entity: `cluster_id` (the component's min
    * member id; unmatched records form singleton clusters of
    * themselves), `n_members`, and the survivor's `canonical_name`.
    * `matches` carries undirected edges `(aCol, bCol)` between record
    * ids from any matcher. */
  def resolve(records: DataFrame, idCol: String, nameCol: String,
      matches: DataFrame, aCol: String = "a",
      bCol: String = "b"): DataFrame = {
    val labels = Clustering.connectedComponents(matches, aCol, bCol)
      .withColumnRenamed("node", idCol)
    records.join(labels, Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("component"), col(idCol)))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        min_by(col(nameCol), col(idCol)).as("canonical_name"))
  }
}
