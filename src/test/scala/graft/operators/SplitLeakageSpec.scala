package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The leakage-free split composition (`split_leakage_free`): near-dup
  * pairs → connected components → hash split keyed on CLUSTER id. The
  * property that matters: two documents connected by ANY dedup pair
  * always land in the same train/eval/test split — the contamination a
  * per-doc hash split permits (an eval doc's near-twin in train) is
  * structurally impossible.
  */
class SplitLeakageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  // 40 distinct base docs + a near-identical twin for each of the
  // first 12 (one token appended — Jaccard >> 0.8, simhash-close)
  private lazy val corpus = {
    val bases = (0 until 40).map { i =>
      val words = (0 until 30).map(w => s"tok${(i * 31 + w * 7) % 97}w$w")
      (i.toLong, words.mkString(" "))
    }
    val twins = (0 until 12).map { i =>
      (100L + i, bases(i)._2 + " tailmarker")
    }
    (bases ++ twins).toDF("doc_id", "text")
  }

  private def splitByCluster(df: org.apache.spark.sql.DataFrame) = {
    val sigs = Dedup.textSignatures(df, "doc_id", "text", n = 3)
    val mh = Dedup.minhashDedupPairsFromSets(sigs,
      k = 16, bands = 4, threshold = 0.8).select("a", "b")
    val sh = Dedup.simhashPairsBlockedFromSigs(sigs, maxDist = 3)
      .select("a", "b")
    val pairs = mh.unionByName(sh)
    val out = Sampling.hashSplit(
      Clustering.canonicalize(df.select("doc_id"), pairs, "doc_id"),
      "cluster_id", Seq("train" -> 8, "eval" -> 1, "test" -> 1))
      .select("doc_id", "cluster_id", "split")
    (pairs, out)
  }

  test("every near-dup pair is split-co-assigned") {
    val (pairs, out) = splitByCluster(corpus)
    val p = pairs.distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(p.length >= 12, s"expected the twin pairs, got ${p.length}")
    val splits = out.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    p.foreach { case (a, b) =>
      assert(splits(a)._2 == splits(b)._2,
        s"pair ($a,$b) straddles splits ${splits(a)._2}/${splits(b)._2}")
      assert(splits(a)._1 == splits(b)._1,
        s"pair ($a,$b) got different cluster ids")
    }
  }

  test("members inherit the CLUSTER's split, not their own doc hash") {
    val (_, out) = splitByCluster(corpus)
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // twins (id >= 100) must carry their base's cluster id (the min)
    val twins = rows.filter(_._1 >= 100L)
    assert(twins.nonEmpty)
    twins.foreach { case (id, cid, _) =>
      assert(cid == id - 100L, s"twin $id labeled cluster $cid")
    }
    // and at least one twin's own-doc-hash split differs from the
    // cluster split it actually received — the leakage the per-doc
    // split would have caused, caught by construction
    val perDoc = Sampling.hashSplit(
        corpus.select("doc_id"), "doc_id",
        Seq("train" -> 8, "eval" -> 1, "test" -> 1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(twins.exists { case (id, _, split) => perDoc(id) != split },
      "seed corpus never disagrees with the per-doc split; weaken test")
    // singletons (clusters of one) keep exactly their per-doc split
    val twinBases = (0 until 12).map(_.toLong).toSet
    rows.filter(r => r._1 < 100L && !twinBases.contains(r._1))
      .foreach { case (id, cid, split) =>
        assert(cid == id && split == perDoc(id),
          s"singleton $id relabeled ($cid, $split)")
      }
  }
}
