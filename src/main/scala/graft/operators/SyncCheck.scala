package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Chunked table checksums — drift DETECTION without moving rows, the
  * pt-table-checksum idea applied to a replication pipeline: where
  * [[SnapshotDiff]] computes the repair (a full outer join that
  * shuffles BOTH tables row-by-row), this answers the cheaper everyday
  * question "is the replica still right, and if not, WHERE?" by
  * comparing per-PK-chunk digests. Only mismatched chunks then pay the
  * row-level diff (reference analog: the full re-sync in river/sync.go
  * is what this scopes down to the damaged key ranges).
  *
  * Shape (the 100 TB argument): each side reduces to chunk-sized
  * digests with a map-side-combined aggregate — the shuffle carries
  * (chunkId, count, xor) triples, never rows — and the comparison join
  * is over ~rows/chunkSize digest rows. Row digests are the top 60
  * md5 bits of a canonical `|`-joined string (md5 is md5 everywhere,
  * so a DuckDB/ClickHouse/MySQL side can compute the same digests in
  * SQL against its own copy without ever shipping data), folded with
  * the order-independent, retry-safe `bit_xor`.
  */
object SyncCheck {

  /** Top-60-bit md5 digest of the row's canonical string form: columns
    * cast to string and joined with `|`. Callers must pre-normalize
    * non-exact types (e.g. floats to integer cents) — string forms of
    * longs and strings are engine-independent, float formatting is
    * not. 15 hex chars keep the hex→long conversion exact. */
  def rowDigest(cols: Seq[Column]): Column =
    conv(substring(md5(concat_ws("|", cols.map(_.cast("string")): _*)),
      1, 15), 16, 10).cast("long")

  /** Per-chunk digest table: `chunk_id` = pk div `chunkSize`, with the
    * chunk's exact row count and the xor-fold of its row digests.
    * Commutative fold ⇒ partition order, retries, and shuffle layout
    * cannot change the digest. */
  def chunkDigests(df: DataFrame, pkCol: String, chunkSize: Long,
      digestCols: Seq[Column]): DataFrame = {
    require(chunkSize > 0, "chunkDigests: chunkSize must be positive")
    // integral `div`, not `/` (long / long is DOUBLE division in Spark
    // and loses exactness past 2^53)
    df.groupBy(call_function("div", col(pkCol).cast("long"),
        lit(chunkSize)).as("chunk_id"))
      .agg(count(lit(1)).as("n_rows"),
        expr_bitXor(rowDigest(digestCols)).as("xor_digest"))
  }

  // functions._ has no bit_xor wrapper; the SQL aggregate is native
  // (codegen'd, map-side combined), not a UDAF
  private def expr_bitXor(c: Column): Column =
    call_function("bit_xor", c)

  /** Compare two sides' chunk digests and keep only damaged chunks:
    * rows missing on either side (count 0, digest NULL) or present on
    * both with a count/digest mismatch. The output is the repair
    * worklist — each row bounds a PK range `[chunk_id·chunkSize,
    * (chunk_id+1)·chunkSize)` to re-diff or re-sync. */
  def mismatchedChunks(master: DataFrame, replica: DataFrame,
      pkCol: String, chunkSize: Long,
      digestCols: Seq[Column]): DataFrame = {
    val m = chunkDigests(master, pkCol, chunkSize, digestCols)
      .withColumnsRenamed(Map("n_rows" -> "n_master",
        "xor_digest" -> "xor_master"))
    val r = chunkDigests(replica, pkCol, chunkSize, digestCols)
      .withColumnsRenamed(Map("n_rows" -> "n_replica",
        "xor_digest" -> "xor_replica"))
    m.join(r, Seq("chunk_id"), "full_outer")
      .select(col("chunk_id"),
        coalesce(col("n_master"), lit(0L)).as("n_master"),
        coalesce(col("n_replica"), lit(0L)).as("n_replica"),
        col("xor_master"), col("xor_replica"))
      .where(col("n_master") =!= col("n_replica") ||
        !(col("xor_master") <=> col("xor_replica")))
  }
}
