package graft.streaming

import java.nio.file.Files

import graft.TestSpark
import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental IVF maintenance: the maintained index must serve the
  * same results as an index over the final state, updates must move
  * list membership, and batch replay must be idempotent. */
class VectorIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_vecidx_").toString

  private def emb: DataFrame =
    spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
      .select("vec_id", "embedding")

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("maintained index equals an assigned probe over the final state") {
    val work = tmp()
    val conf = VectorIndex.Conf(stateBuckets = 8)
    val id = col("vec_id")
    val boot = emb.filter(id % 3 =!= 0)
    val cents = VectorIndex.bootstrap(boot, work, conf)
    val vecType = emb.schema("embedding").dataType
    val feed = emb.filter(id % 3 === 0)
      .select(id, col("embedding"), lit("I").as("_op"), (id * 10).as("_seq"))
      .unionByName(emb.filter(id % 5 === 0)
        .select(id, transform(col("embedding"), x => -x).cast(vecType)
          .as("embedding"), lit("U").as("_op"), (id * 10 + 1).as("_seq")))
      .unionByName(emb.filter(id % 7 === 0)
        .select(id, lit(null).cast(vecType).as("embedding"),
          lit("D").as("_op"), (id * 10 + 2).as("_seq")))
    // two batches split by id parity — updates/deletes of batch-0 keys
    // land in batch 1 too
    VectorIndex.applyBatch(feed.filter(id % 2 === 0), 0L, work, conf)
    VectorIndex.applyBatch(feed.filter(id % 2 === 1), 1L, work, conf)
    val got = VectorIndex.topK(spark, work, feed.schema,
      VectorIndex.indexedView(spark, work, feed.schema, conf)
        .filter(col("neighbor_id") < 10)
        .select(col("neighbor_id").as("vec_id"), col("cv").as("embedding")),
      k = 5, conf)
    // the truth: the final vector set, assigned under the SAME frozen
    // centroids, probed identically
    val fin = emb.filter(id % 7 =!= 0)
      .select(id, when(id % 5 === 0,
        transform(col("embedding"), x => -x).cast(vecType))
        .otherwise(col("embedding")).as("embedding"))
    val finAssigned = fin.select(col("vec_id").as("neighbor_id"),
      col("embedding").cast("array<double>").as("cv"))
      .withColumn("bucket", Similarity.nearestCentroid(col("cv"), cents,
        native = true).cast("int"))
    val want = Similarity.ivfTopKAssigned(finAssigned,
      fin.filter(id < 10), cents, k = 5, nprobe = conf.nprobe,
      native = true)
    assert(rows(got) == rows(want))
    assert(got.count() > 0)
  }

  test("an update moves the vector's list membership") {
    val work = tmp()
    val conf = VectorIndex.Conf(dim = 2, nlist = 2, nprobe = 1,
      stateBuckets = 4)
    // two tight clusters on orthogonal axes
    val boot = Seq(
      (1L, Seq(1.0f, 0.01f)), (2L, Seq(1.0f, 0.02f)),
      (3L, Seq(0.01f, 1.0f)), (4L, Seq(0.02f, 1.0f)))
      .toDF("vec_id", "embedding")
    VectorIndex.bootstrap(boot, work, conf)
    val schema = boot
      .withColumn("_op", lit("I")).withColumn("_seq", lit(0L)).schema
    def viewList(): Map[Long, Int] =
      VectorIndex.indexedView(spark, work, schema, conf)
        .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val before = viewList()
    assert(before(1L) == before(2L) && before(3L) == before(4L)
      && before(1L) != before(3L))
    // vector 1 re-embeds into the other cluster
    val up = Seq((1L, Seq(0.0f, 1.0f), "U", 5L))
      .toDF("vec_id", "embedding", "_op", "_seq")
    VectorIndex.applyBatch(up, 0L, work, conf)
    val after = viewList()
    assert(after(1L) == after(3L), s"expected 1 to join 3's list: $after")
    assert(after(2L) == before(2L))
  }

  test("optimize clusters each bucket file by list id, view unchanged") {
    val work = tmp()
    val conf = VectorIndex.Conf(stateBuckets = 4)
    val boot = emb
    VectorIndex.bootstrap(boot, work, conf)
    val schema = boot
      .withColumn("_op", lit("I")).withColumn("_seq", lit(0L)).schema
    val before = rows(VectorIndex.indexedView(spark, work, schema, conf))
    VectorIndex.optimize(spark, work, schema, conf, keepVersions = 1)
    val after = rows(VectorIndex.indexedView(spark, work, schema, conf))
    assert(after == before)
    // every bucket: one compacted file whose ivf_list column is sorted
    (0 until conf.stateBuckets).foreach { b =>
      val vdirs = new java.io.File(s"$work/state/bucket=$b").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("v="))
      assert(vdirs.length == 1, s"bucket $b not GCed to one version")
      val files = vdirs.head.listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"bucket $b not compacted to one file")
      val lists = spark.read.parquet(files.head.getPath)
        .select("ivf_list").collect().map(_.getInt(0)).toSeq
      assert(lists == lists.sorted, s"bucket $b file not list-clustered")
    }
  }

  test("crash-replay of a batch is idempotent") {
    val work = tmp()
    val conf = VectorIndex.Conf(stateBuckets = 8)
    val boot = emb.filter(col("vec_id") % 3 =!= 0)
    VectorIndex.bootstrap(boot, work, conf)
    val feed = emb.filter(col("vec_id") % 3 === 0)
      .select(col("vec_id"), col("embedding"), lit("I").as("_op"),
        (col("vec_id") * 10).as("_seq"))
    VectorIndex.applyBatch(feed, 0L, work, conf)
    val before = rows(VectorIndex.indexedView(spark, work, feed.schema,
      conf))
    VectorIndex.applyBatch(feed, 0L, work, conf)
    val after = rows(VectorIndex.indexedView(spark, work, feed.schema,
      conf))
    assert(after == before)
  }
}
