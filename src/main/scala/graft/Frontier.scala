package graft

import org.apache.spark.sql.DataFrame

/** Stage-frontier materialization policy — the one knob that separates
  * "fastest on a single box" from "survives executor loss on a 1000-node
  * preemptible fleet".
  *
  * A *frontier* is a multi-consumer intermediate a pipeline fans out
  * from (dedup survivors feeding both an LM filter and a mixture stage,
  * a CC round's edge set feeding the next round twice): it must be
  * materialized once with its lineage truncated, or every consumer
  * re-executes the whole upstream chain and iterative plans nest
  * rounds deep.
  *
  * Two modes, selected by the `spark.graft.frontierMode` conf:
  *
  *   - `eager-local` (default): `localCheckpoint(eager = true)` —
  *     blocks live on executor local storage. Fastest (no DFS
  *     round-trip) and right for benchmarks and stable clusters, but
  *     the truncated lineage means ONE lost executor makes every
  *     downstream consumer unrecoverable (Spark cannot recompute a
  *     local checkpoint block it no longer holds).
  *   - `reliable`: `Dataset.checkpoint(eager = true)` to the reliable
  *     store named by `spark.graft.checkpointDir` (or a checkpoint dir
  *     already set on the SparkContext) — one DFS write per frontier
  *     buys recovery from any executor loss. This is the mode a
  *     100 TB run on preemptible capacity should set; see SCALE.md
  *     ("Stage frontiers").
  *
  * Both modes produce bit-identical results (FrontierSpec proves it on
  * a composed pipeline) — the choice is purely a fault-tolerance /
  * latency trade, so it lives in ONE place instead of being hard-coded
  * at thirty call sites.
  */
object Frontier {
  /** `eager-local` (default) | `reliable`. */
  val ModeKey = "spark.graft.frontierMode"

  /** Reliable-mode checkpoint directory (HDFS/S3/… URI). Consulted
    * only when the SparkContext has no checkpoint dir set yet. */
  val DirKey = "spark.graft.checkpointDir"

  /** Materialize `df` as a stage frontier under the session's
    * configured mode. Eager in both modes: the caller is about to fan
    * out, so the compute must happen exactly once, now. */
  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.get(ModeKey, "eager-local") match {
      case "eager-local" => df.localCheckpoint(eager = true)
      case "reliable" =>
        val sc = spark.sparkContext
        if (sc.getCheckpointDir.isEmpty) {
          val dir = spark.conf.get(DirKey, "")
          require(dir.nonEmpty,
            s"$ModeKey=reliable needs a checkpoint directory: set " +
              s"$DirKey (or SparkContext.setCheckpointDir) to a " +
              "reliable store the whole cluster can read")
          sc.setCheckpointDir(dir)
        }
        df.checkpoint(eager = true)
      case other => throw new IllegalArgumentException(
        s"$ModeKey: unknown mode '$other' — use eager-local or reliable")
    }
  }

  /** `df.frontier` — call-site sugar so pipelines read linearly. */
  implicit class FrontierOps(private val df: DataFrame) extends AnyVal {
    def frontier: DataFrame = cut(df)
  }
}
