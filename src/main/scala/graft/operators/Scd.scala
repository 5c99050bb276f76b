package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-Changing-Dimension Type 2 — the history-preserving
  * counterpart of [[CdcMerge]]'s last-write-wins state: instead of
  * keeping only each key's latest version, keep EVERY version with its
  * validity interval (Kimball's SCD2). The warehouse use of a CDC
  * feed: "what did this order look like at sequence S" becomes a range
  * predicate on `(valid_from, valid_to]`, and a delete closes the
  * final interval without opening a new one.
  *
  * Shape: ONE shuffle on the key + a per-key sort for the `lead`
  * window — the same exchange the LWW collapse pays, no self-join of
  * the feed against itself. Intervals are in sequence units (binlog
  * position / `_seq`), the same total order the merge path uses, so
  * history and state reconstructions agree by construction. */
object Scd {

  /** Build the version history from a change feed
    * (`payload + _op + _seq`): one row per I/U event with
    * `valid_from` = its seq, `valid_to` = the key's next event seq
    * (NULL while current), `is_current` = 1 on the open interval.
    * Delete events emit no row — they only close their predecessor's
    * interval. Replaying any point `S` as
    * `valid_from <= S AND (valid_to IS NULL OR valid_to > S)`
    * reproduces the LWW state at `S` exactly (spec-proven). */
  def scd2(changes: DataFrame, keyCols: Seq[String],
      seqCol: String = "_seq", opCol: String = "_op"): DataFrame = {
    require(keyCols.nonEmpty, "scd2: need at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(seqCol))
    changes
      .withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .filter(col(opCol) =!= "D")
      .withColumn("is_current", col("valid_to").isNull.cast("int"))
      .withColumnRenamed(seqCol, "valid_from")
      .drop(opCol)
  }

  /** Time travel: the table's state as of sequence `seq`, reconstructed
    * from a [[scd2]] history — the interval-cover predicate, nothing
    * else, so it is a scan-local filter over the history table (at
    * scale: a parquet range predicate on `valid_from`/`valid_to`,
    * pushed to the scan). Equals the LWW state of the feed truncated
    * at `seq` exactly (spec-proven; a delete closes its predecessor's
    * interval, so a key dead at `seq` has no covering row). */
  def stateAt(history: DataFrame,
      seq: org.apache.spark.sql.Column): DataFrame =
    history
      .filter(col("valid_from") <= seq &&
        (col("valid_to").isNull || col("valid_to") > seq))
      .drop("valid_from", "valid_to", "is_current")
}
