package graft.streaming

import graft.TestSpark
import graft.operators.Dedup
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

class DedupIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private val cfg = DedupIndex.Config(sigBuckets = 4, bandBuckets = 8,
    pairBuckets = 4)

  private def newStore(): String =
    Files.createTempDirectory("graft_dedupindex_").toString

  // exact dups (0,1), near dups (2,3), unrelated (4,5); doc 6 starts
  // unrelated and is EDITED into a copy of doc 4's text
  private def docText(id: Long): String = id match {
    case 0 => "the quick brown fox jumps over the lazy dog again and again"
    case 1 => "the quick brown fox jumps over the lazy dog again and again"
    case 2 => "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    case 3 => "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"
    case 4 => "completely different content about spark query engines at scale"
    case 5 => "yet another unrelated document mentioning benchmarks and parquet"
    case 6 => "a third standalone text speaking of optimizers and shuffles only"
    case _ => fail(s"no text for doc $id")
  }

  private def ev(op: String, seq: Long, id: Long,
      text: String): (String, Long, Long, String) = (op, seq, id, text)

  private def feed(rows: Seq[(String, Long, Long, String)]): DataFrame =
    rows.toDF("_op", "_seq", "doc_id", "text")

  private def pairsOf(store: String): Set[(Long, Long)] =
    DedupIndex.currentPairs(spark, store, cfg)
      .select("a", "b").as[(Long, Long)].collect().toSet

  private def rebuildPairs(corpus: DataFrame): Set[(Long, Long)] =
    Dedup.minhashDedupPairs(corpus, "doc_id", "text",
      n = cfg.n, k = cfg.k, bands = cfg.bands, threshold = cfg.threshold)
      .select("a", "b").as[(Long, Long)].collect().toSet

  test("update destroys stale pairs and creates new ones; delete retires") {
    val store = newStore()
    // batch 0: insert everything
    DedupIndex.applyBatch(feed((0L to 6L).map(i =>
      ev("I", i * 10, i, docText(i)))), store, 0L, cfg)
    assert(pairsOf(store) == Set((0L, 1L), (2L, 3L)))
    // batch 1: doc 1 edited away from doc 0 (pair dies); doc 6 edited
    // INTO doc 4's text (pair appears)
    DedupIndex.applyBatch(feed(Seq(
      ev("U", 101, 1L, docText(3)),
      ev("U", 102, 6L, docText(4)))), store, 1L, cfg)
    assert(pairsOf(store) == Set((1L, 3L), (4L, 6L), (2L, 3L), (1L, 2L)))
    // (doc 1 now carries doc 3's text: pairs with both 2 and 3)
    // batch 2: delete doc 3 — its pairs retire, others survive
    DedupIndex.applyBatch(feed(Seq(
      ev("D", 200, 3L, null))), store, 2L, cfg)
    assert(pairsOf(store) == Set((4L, 6L), (1L, 2L)))
    // the index's final state == a from-scratch rebuild of the live corpus
    val live = Seq(0L, 1L, 2L, 4L, 5L, 6L).map {
      case 1L => (1L, docText(3))
      case 6L => (6L, docText(4))
      case i => (i, docText(i))
    }.toDF("doc_id", "text")
    assert(pairsOf(store) == rebuildPairs(live))
  }

  test("batch slicing does not change the final state") {
    val events = (0L to 6L).map(i => ev("I", i * 10, i, docText(i))) ++ Seq(
      ev("U", 101, 1L, docText(3)),
      ev("U", 102, 6L, docText(4)),
      ev("D", 200, 3L, null))
    val oneShot = newStore()
    DedupIndex.applyBatch(feed(events), oneShot, 0L, cfg)
    val sliced = newStore()
    events.grouped(3).zipWithIndex.foreach { case (g, i) =>
      DedupIndex.applyBatch(feed(g), sliced, i.toLong, cfg)
    }
    assert(pairsOf(oneShot) == pairsOf(sliced))
    assert(pairsOf(oneShot).nonEmpty)
    val sigsA = DedupIndex.currentSigs(spark, oneShot, cfg)
      .select(col("doc_id"), col("n_sh")).as[(Long, Long)].collect().toSet
    val sigsB = DedupIndex.currentSigs(spark, sliced, cfg)
      .select(col("doc_id"), col("n_sh")).as[(Long, Long)].collect().toSet
    assert(sigsA == sigsB)
  }

  test("crash-replay of a batch is idempotent") {
    val store = newStore()
    DedupIndex.applyBatch(feed((0L to 6L).map(i =>
      ev("I", i * 10, i, docText(i)))), store, 0L, cfg)
    val b1 = feed(Seq(ev("U", 101, 1L, docText(3)), ev("D", 200, 3L, null)))
    DedupIndex.applyBatch(b1, store, 1L, cfg)
    val before = pairsOf(store)
    DedupIndex.applyBatch(b1, store, 1L, cfg) // replay
    assert(pairsOf(store) == before)
  }

  test("stream driver == batch fold; auto-optimize bounds versions") {
    val store = newStore()
    val work = Files.createTempDirectory("graft_dedupindex_stream_")
    val events = (0L to 6L).map(i => ("I", i * 10, i, docText(i)))
    val upd: Seq[(String, Long, Long, String)] = Seq(
      ("U", 101L, 1L, docText(3)), ("U", 102L, 6L, docText(4)))
    val del: Seq[(String, Long, Long, String)] =
      Seq(("D", 200L, 3L, docText(3)))
    // three files → three micro-batches under maxFilesPerTrigger=1
    feed(events).coalesce(1).write.parquet(s"$work/in/b0")
    feed(upd).coalesce(1).write.parquet(s"$work/in/b1")
    feed(del).coalesce(1).write.parquet(s"$work/in/b2")
    val src = spark.readStream
      .schema(feed(events).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$work/in/*")
    val q = DedupIndex.stream(src, store, cfg, optimizeEvery = 2)
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(pairsOf(store) == Set((4L, 6L), (1L, 2L)))
    // auto-optimize at batch 2 + final state: every sig bucket holds
    // at most keepVersions(=2) versions
    val sigDir = new java.io.File(s"$store/sigs")
    val worst = Option(sigDir.listFiles()).toSeq.flatten
      .filter(_.getName.startsWith("bucket="))
      .map(b => b.listFiles().count(_.getName.startsWith("v=")))
      .maxOption.getOrElse(0)
    assert(worst <= 3, s"version accumulation: $worst versions in a bucket")
  }

  test("a late batch below the stored sequence is a no-op") {
    val store = newStore()
    DedupIndex.applyBatch(feed((0L to 6L).map(i =>
      ev("I", i * 10, i, docText(i)))), store, 0L, cfg)
    DedupIndex.applyBatch(feed(Seq(
      ev("U", 101, 1L, docText(3)))), store, 1L, cfg)
    val before = pairsOf(store)
    // redelivered ORIGINAL insert of doc 1 (seq 10 < stored 101) in a
    // LATER batch: without the stored-seq guard its stale text would
    // win in bands/pairs via the batch-monotone engine seqs
    DedupIndex.applyBatch(feed(Seq(
      ev("I", 10, 1L, docText(1)))), store, 2L, cfg)
    assert(pairsOf(store) == before)
    val sig = DedupIndex.currentSigs(spark, store, cfg)
      .filter(col("doc_id") === 1L).select(col("n_sh")).as[Long].head()
    val sig3 = DedupIndex.currentSigs(spark, store, cfg)
      .filter(col("doc_id") === 3L).select(col("n_sh")).as[Long].head()
    assert(sig == sig3) // doc 1 still carries doc 3's (updated) text
  }

  test("optimize preserves the state") {
    val store = newStore()
    DedupIndex.applyBatch(feed((0L to 6L).map(i =>
      ev("I", i * 10, i, docText(i)))), store, 0L, cfg)
    DedupIndex.applyBatch(feed(Seq(
      ev("U", 101, 1L, docText(3)))), store, 1L, cfg)
    val before = pairsOf(store)
    DedupIndex.optimize(spark, store, cfg)
    assert(pairsOf(store) == before)
  }

  test("caller-shared probe == self-probed fold; bucket mismatch rejects") {
    val a = newStore(); val b = newStore()
    val b0 = feed((0L to 6L).map(i => ev("I", i * 10, i, docText(i))))
    val b1 = feed(Seq(ev("U", 101, 1L, docText(3)),
      ev("D", 102, 5L, null)))
    DedupIndex.applyBatch(b0, a, 0L, cfg)
    DedupIndex.applyBatch(b1, a, 1L, cfg)
    // same fold with the probe computed by the caller (the
    // cdc_corpus_clean sharing shape) — state must be identical
    DedupIndex.applyBatch(b0, b, 0L, cfg,
      probe = Some(DedupIndex.probeBatch(b0, cfg.sigBuckets)))
    DedupIndex.applyBatch(b1, b, 1L, cfg,
      probe = Some(DedupIndex.probeBatch(b1, cfg.sigBuckets)))
    assert(pairsOf(a) == pairsOf(b))
    assert(DedupIndex.currentSigs(spark, a, cfg).count() ==
      DedupIndex.currentSigs(spark, b, cfg).count())
    // the deletes-only flag is honest: a pure-D batch probes false
    assert(!DedupIndex.probeBatch(
      feed(Seq(ev("D", 200, 3L, null))), cfg.sigBuckets).mayHaveUpserts)
    // a probe computed at the wrong bucket count cannot be applied
    intercept[IllegalArgumentException] {
      DedupIndex.applyBatch(b1, b, 2L, cfg,
        probe = Some(DedupIndex.probeBatch(b1, cfg.sigBuckets + 1)))
    }
  }
}
