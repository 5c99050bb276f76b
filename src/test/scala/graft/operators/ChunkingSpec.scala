package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class ChunkingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  test("overlapping windows cover every token, last chunk short") {
    val docs = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val got = Chunking.tokenWindows(docs, "doc_id", "text",
      size = 4, stride = 2)
      .select("chunk_idx", "chunk_text", "n_tokens")
      .as[(Int, String, Int)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (0, "a b c d", 4), (1, "c d e f", 4), (2, "e f g", 3)))
  }

  test("doc shorter than one window -> single chunk; empty doc -> none") {
    val docs = Seq((1L, "x y"), (2L, "  ")).toDF("doc_id", "text")
    val got = Chunking.tokenWindows(docs, "doc_id", "text",
      size = 8, stride = 8)
      .as[(Long, Int, String, Int)].collect().toSeq
    assert(got == Seq((1L, 0, "x y", 2)))
  }
}
