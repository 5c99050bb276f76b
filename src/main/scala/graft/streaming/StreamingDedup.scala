package graft.streaming

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact dedup: emit only the FIRST occurrence of each content
  * fingerprint across the whole (unbounded) stream — the stateful
  * generalization of [[graft.operators.Dedup.exact]] for continuous
  * ingestion pipelines.
  *
  * Implementation: `flatMapGroupsWithState` over the fingerprint key.
  * State per key is a single boolean ("seen"), so state size is O(distinct
  * fingerprints) with ~1 byte of payload — the partitioned, fault-tolerant
  * equivalent of the dedup hash set a single-node pipeline would keep in
  * memory. With a watermark on an event-time column the state can expire
  * (`GroupStateTimeout.EventTimeTimeout`) for bounded retention at 100 TB;
  * here retention is unbounded like the reference's sink-side
  * ReplacingMergeTree collapse.
  */
object StreamingDedup {

  /** Public: the generated encoder projection code instantiates it. */
  case class Doc(fp: String, doc_id: Long, text: String)

  /** Deduplicate a stream of documents by content fingerprint. Returns
    * (doc_id, fp) of first-seen documents. Works on any DataFrame with
    * (doc_id: long, text: string). */
  def firstSeen(docs: DataFrame): Dataset[(Long, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    implicit val docEnc: Encoder[Doc] = Encoders.product[Doc]
    docs
      .select(TextFunctions.fingerprint(col("text")).as("fp"),
        col("doc_id"), col("text"))
      .as[Doc]
      .groupByKey(_.fp)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (fp: String, rows: Iterator[Doc], state: GroupState[Boolean]) => {
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            // batch order within a key is not guaranteed -> pick min id,
            // mirroring Dedup.exact's deterministic keep-lowest rule
            val first = rows.minBy(_.doc_id)
            Iterator.single((first.doc_id, fp))
          }
        })
  }
}
