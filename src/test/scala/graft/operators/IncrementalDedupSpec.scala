package graft.operators

import java.nio.file.Files

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private def docs = spark.read
    .parquet(s"${TestSpark.Sf0001}/documents.parquet")

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("a").cast("long"), col("b").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def batchPairs: Set[(Long, Long)] =
    pairSet(Dedup.minhashDedupPairs(docs, "doc_id", "text",
      n = 3, k = 16, bands = 4, threshold = 0.8))

  test("replayed batches emit exactly the batch pair set (2 and 3 splits)") {
    for (splits <- Seq(2, 3)) {
      val store = Files.createTempDirectory("graft_inc_").toString
      (0 until splits).foreach { i =>
        IncrementalDedup.ingest(
          docs.filter(pmod(col("doc_id"), lit(splits)) === i),
          "doc_id", "text", store, batchId = i.toLong)
      }
      val inc = pairSet(IncrementalDedup.allPairs(spark, store))
      assert(inc == batchPairs, s"splits=$splits")
    }
  }

  test("each ingest emits only pairs touching its batch — no re-emission") {
    val store = Files.createTempDirectory("graft_inc_").toString
    val b2Ids = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    IncrementalDedup.ingest(docs.filter(pmod(col("doc_id"), lit(2)) === 0),
      "doc_id", "text", store, batchId = 0L)
    val emitted2 = pairSet(IncrementalDedup.ingest(
      docs.filter(pmod(col("doc_id"), lit(2)) === 1),
      "doc_id", "text", store, batchId = 1L))
    assert(emitted2.nonEmpty)
    assert(emitted2.forall { case (a, b) =>
      b2Ids.contains(a) || b2Ids.contains(b) }, emitted2)
    // and the two batches' emissions partition the full pair set
    val emitted1 = pairSet(spark.read.parquet(s"$store/pairs/batch=0"))
    assert((emitted1 & emitted2).isEmpty)
    assert((emitted1 | emitted2) == batchPairs)
  }

  test("store is bucket-partitioned so a batch scans only its buckets") {
    val store = Files.createTempDirectory("graft_inc_").toString
    IncrementalDedup.ingest(docs, "doc_id", "text", store, batchId = 0L)
    val bands = spark.read.parquet(s"$store/bands")
    // partition pruning: a bucket-restricted read touches a strict
    // subset of the store's files — the mechanism each ingest's
    // cross-join uses to pay O(batch), not O(corpus).
    // input_file_name() reflects the files ACTUALLY read post-pruning
    // (inputFiles on the frame reports the unpruned relation).
    val all = bands.select(input_file_name()).distinct().count()
    val one = bands.filter(col("bucket") === 7)
      .select(input_file_name()).distinct().count()
    assert(one < all, s"one=$one all=$all")
    val plan = bands.filter(col("bucket") === 7)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(bands.columns.contains("bucket"))
  }

  test("re-ingesting a batchId overwrites, not appends (crash replay)") {
    val store = Files.createTempDirectory("graft_inc_").toString
    IncrementalDedup.ingest(docs.filter(pmod(col("doc_id"), lit(2)) === 0),
      "doc_id", "text", store, batchId = 0L)
    val b2 = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
    val first = pairSet(IncrementalDedup.ingest(b2, "doc_id", "text",
      store, batchId = 1L))
    val sigRows = spark.read.parquet(s"$store/sigs").count()
    // a crashed ingest replayed with the same batchId must leave the
    // store EXACTLY as a single successful ingest would
    val replay = pairSet(IncrementalDedup.ingest(b2, "doc_id", "text",
      store, batchId = 1L))
    assert(replay == first)
    assert(spark.read.parquet(s"$store/sigs").count() == sigRows)
    assert(pairSet(IncrementalDedup.allPairs(spark, store)) == batchPairs)
  }

  test("streaming ingest over micro-batches == batch pairs") {
    val work = Files.createTempDirectory("graft_incs_").toString
    val store = s"$work/store"
    // several files → several micro-batches under maxFilesPerTrigger=1
    docs.filter(pmod(col("doc_id"), lit(3)) === 0)
      .write.parquet(s"$work/in")
    docs.filter(pmod(col("doc_id"), lit(3)) === 1)
      .write.mode("append").parquet(s"$work/in")
    docs.filter(pmod(col("doc_id"), lit(3)) === 2)
      .write.mode("append").parquet(s"$work/in")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 2).parquet(s"$work/in")
    val q = IncrementalDedup.stream(stream, "doc_id", "text", store)
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(pairSet(IncrementalDedup.allPairs(spark, store)) == batchPairs)
  }

  test("property: random corpora + random k-way splits == batch pairs") {
    import scala.util.Random
    import spark.implicits._
    for (seed <- 40 until 46) {
      val rnd = new Random(seed)
      val vocab = Vector.tabulate(30)(i => s"w${i}x")
      def sentence(n: Int) =
        Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      // base docs + planted near-dups (exact copies and one-token edits)
      val base = (0 until 40).map(i => (i.toLong, sentence(8 + rnd.nextInt(8))))
      val dups = (0 until 12).map { j =>
        val (srcId, text) = base(rnd.nextInt(base.size))
        val mutated =
          if (rnd.nextBoolean()) text
          else {
            val toks = text.split(" ")
            toks.updated(rnd.nextInt(toks.length),
              vocab(rnd.nextInt(vocab.size))).mkString(" ")
          }
        val _ = srcId
        (100L + j, mutated)
      }
      val corpus = (base ++ dups).toDF("doc_id", "text")
      val want = pairSet(Dedup.minhashDedupPairs(corpus, "doc_id", "text",
        n = 3, k = 16, bands = 4, threshold = 0.8))
      val k = 2 + rnd.nextInt(3)
      val assign = (base ++ dups).map { case (id, _) => id -> rnd.nextInt(k) }
        .toMap
      val store = Files.createTempDirectory("graft_incp_").toString
      val assigned = corpus.withColumn("_b",
        udf((id: Long) => assign(id)).apply(col("doc_id")))
      (0 until k).foreach { b =>
        IncrementalDedup.ingest(assigned.filter(col("_b") === b)
          .drop("_b"), "doc_id", "text", store, batchId = b.toLong)
      }
      val got = pairSet(IncrementalDedup.allPairs(spark, store))
      assert(got == want, s"seed=$seed k=$k")
    }
  }

  test("compact folds batches into one base per bucket; behavior unchanged") {
    def threeBatchStore(): String = {
      val store = Files.createTempDirectory("graft_incc_").toString
      (0 until 3).foreach { i =>
        IncrementalDedup.ingest(
          docs.filter(pmod(col("doc_id"), lit(3)) === i),
          "doc_id", "text", store, batchId = i.toLong)
      }
      store
    }
    val store = threeBatchStore()
    val pairsBefore = pairSet(IncrementalDedup.allPairs(spark, store))
    val sigsBefore = spark.read.parquet(s"$store/sigs")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    IncrementalDedup.compact(spark, store)
    // layout: every bucket dir holds exactly one batch=-1 partition
    // with one data file
    val bandBuckets = new java.io.File(s"$store/bands").listFiles()
      .filter(_.getName.startsWith("bucket="))
    assert(bandBuckets.nonEmpty)
    bandBuckets.foreach { b =>
      val parts = b.listFiles().filter(_.isDirectory).map(_.getName).toSeq
      assert(parts == Seq("batch=-1"), s"${b.getName}: $parts")
      val files = new java.io.File(b, "batch=-1").listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(files == 1, s"${b.getName}: $files files")
    }
    // content preserved, pairs log untouched
    assert(spark.read.parquet(s"$store/sigs")
      .select("doc_id").collect().map(_.getLong(0)).toSet == sigsBefore)
    assert(pairSet(IncrementalDedup.allPairs(spark, store)) == pairsBefore)
    // a post-compact ingest of genuinely new docs emits the same pairs
    // as the same ingest against an uncompacted store
    val newBatch = docs.limit(60)
      .select((col("doc_id") + 50000).as("doc_id"), col("text"))
    val gotCompacted = pairSet(IncrementalDedup.ingest(
      newBatch, "doc_id", "text", store, batchId = 3L))
    val store2 = threeBatchStore()
    val gotPlain = pairSet(IncrementalDedup.ingest(
      newBatch, "doc_id", "text", store2, batchId = 3L))
    assert(gotCompacted == gotPlain)
    // double-compact is idempotent
    IncrementalDedup.compact(spark, store)
    assert(pairSet(IncrementalDedup.allPairs(spark, store)) ==
      pairsBefore ++ gotCompacted)
  }

  test("streaming with auto-compaction == batch pairs; files stay O(buckets)") {
    val work = Files.createTempDirectory("graft_incsc_").toString
    val store = s"$work/store"
    // six single-file writes → six micro-batches under
    // maxFilesPerTrigger=1; compactEvery=2 folds at the start of
    // batches 2 and 4
    (0 until 6).foreach { i =>
      docs.filter(pmod(col("doc_id"), lit(6)) === i).coalesce(1)
        .write.mode("append").parquet(s"$work/in")
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$work/in")
    val q = IncrementalDedup.stream(stream, "doc_id", "text", store,
        compactEvery = 2)
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // identical pair set to the one-shot batch run
    assert(pairSet(IncrementalDedup.allPairs(spark, store)) == batchPairs)
    // the last fold ran at batch 4 (folding 0-3); only the base and the
    // un-folded tail batches survive as store partitions
    for (name <- Seq("sigs", "bands")) {
      val batches = spark.read.parquet(s"$store/$name")
        .select(col("batch").cast("long")).distinct()
        .collect().map(_.getLong(0)).toSet
      assert(batches.subsetOf(Set(-1L, 4L, 5L)), s"$name: $batches")
      // every base partition is one file
      new java.io.File(s"$store/$name").listFiles()
        .filter(_.getName.startsWith("bucket=")).foreach { b =>
          val base = new java.io.File(b, "batch=-1")
          if (base.exists()) {
            val files = base.listFiles().count(_.getName.endsWith(".parquet"))
            assert(files == 1, s"$name/${b.getName}: $files files")
          }
        }
    }
    // the epoch records the fold: replaying a folded batch fail-stops
    assert(IncrementalDedup.compactionEpoch(spark, store) == 4L)
    val err = intercept[IllegalArgumentException] {
      IncrementalDedup.ingest(docs.limit(5), "doc_id", "text", store,
        batchId = 2L)
    }
    assert(err.getMessage.contains("compaction epoch"))
  }

  test("allPairs on a store with zero ingests is empty, not an error") {
    val store = Files.createTempDirectory("graft_ince_").toString
    val pairs = IncrementalDedup.allPairs(spark, store)
    assert(pairs.count() == 0)
    assert(pairs.columns.toSeq == Seq("a", "b", "jaccard"))
  }

  test("first ingest into an empty store bootstraps (no cross pairs)") {
    val store = Files.createTempDirectory("graft_inc_").toString
    val emitted = pairSet(IncrementalDedup.ingest(
      docs.limit(50), "doc_id", "text", store, batchId = 0L))
    val direct = pairSet(Dedup.minhashDedupPairs(docs.limit(50),
      "doc_id", "text", n = 3, k = 16, bands = 4, threshold = 0.8))
    assert(emitted == direct)
  }
}
