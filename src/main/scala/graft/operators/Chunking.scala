package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking: split long documents into overlapping token
  * windows — the standard pre-tokenization step of a training-data
  * pipeline (context-length packing, RAG indexing). No shuffle: each doc
  * expands independently; output size ≈ input tokens × (1 + overlap
  * fraction).
  *
  * Chunk i covers tokens [i·stride, i·stride + size); the last chunk is
  * whatever remains past the final full stride (shorter chunks are
  * emitted, empty ones are not). Deterministic and purely arithmetic, so
  * a SQL oracle reproduces it exactly.
  */
object Chunking {

  /** (doc_id, chunk_idx, chunk_text, n_tokens) per window of `size`
    * tokens advancing by `stride` (< size ⇒ overlap). */
  def tokenWindows(docs: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    val toks = TextFunctions.tokens(col(textCol))
    docs
      .select(col(idCol).as("doc_id"), toks.as("t"))
      .withColumn("n", size_(col("t")))
      .filter(col("n") > 0)
      // number of chunks: ceil(max(n - size, 0) / stride) + 1
      .withColumn("n_chunks",
        ceil(greatest(col("n") - size, lit(0)) / lit(stride.toDouble))
          .cast("int") + 1)
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_chunks") - 1)).as("chunk_idx"),
        col("t"))
      .withColumn("chunk",
        slice(col("t"), col("chunk_idx") * stride + 1, lit(size)))
      .select(col("doc_id"), col("chunk_idx"),
        concat_ws(" ", col("chunk")).as("chunk_text"),
        size_(col("chunk")).as("n_tokens"))
  }

  // functions.size clashes with the Int params above
  private def size_(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.size(c)
}
