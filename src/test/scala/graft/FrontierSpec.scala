package graft

import java.nio.file.Files

import graft.operators.Clustering
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The stage-frontier mode switch ([[Frontier]]): `eager-local`
  * (benchmark default, executor-local blocks) and `reliable`
  * (DFS-checkpointed, survives executor loss) must be byte-equivalent
  * on the pipelines that use frontiers — the mode is purely a
  * fault-tolerance/latency trade, never a semantics one. */
class FrontierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def withMode[A](mode: String)(body: => A): A = {
    val prev = spark.conf.getOption(Frontier.ModeKey)
    spark.conf.set(Frontier.ModeKey, mode)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(Frontier.ModeKey, v)
      case None => spark.conf.unset(Frontier.ModeKey)
    }
  }

  // a frontier-heavy composition: CC over a chain+clique graph (one
  // .frontier per round inside connectedComponents) followed by a
  // keep-one canonicalization — the corpus_clean shape in miniature
  private def pipeline(): Set[(Long, Long, Boolean)] = {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 10L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("a", "b")
    val docs = (1L to 25L).toDF("doc_id")
    Clustering.canonicalize(docs, pairs, "doc_id")
      .select("doc_id", "cluster_id", "keep")
      .as[(Long, Long, Boolean)].collect().toSet
  }

  test("eager-local and reliable frontiers produce identical results") {
    val ckpt = Files.createTempDirectory("graft_frontier_ckpt_").toString
    val eager = withMode("eager-local")(pipeline())
    val reliable = withMode("reliable") {
      spark.conf.set(Frontier.DirKey, ckpt)
      pipeline()
    }
    assert(eager == reliable)
    // reliable mode actually wrote recoverable RDD checkpoints
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isDefined)
    val dir = new java.io.File(
      new java.net.URI(sc.getCheckpointDir.get).getPath)
    assert(dir.exists && dir.listFiles != null && dir.listFiles.nonEmpty,
      "reliable frontier mode must persist checkpoint data to the dir")
  }

  test("reliable mode without a checkpoint dir fails with instruction") {
    // only when the context has none set — this suite may run after the
    // test above already set one, so exercise the validation directly
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      val df: DataFrame = Seq(1).toDF("x")
      val e = intercept[IllegalArgumentException](withMode("reliable") {
        spark.conf.unset(Frontier.DirKey)
        Frontier.cut(df)
      })
      assert(e.getMessage.contains(Frontier.DirKey))
    }
  }

  test("unknown mode is rejected") {
    val e = intercept[IllegalArgumentException](
      withMode("bogus")(Frontier.cut(Seq(1).toDF("x"))))
    assert(e.getMessage.contains("bogus"))
  }
}
