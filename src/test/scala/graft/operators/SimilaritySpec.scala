package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private lazy val embeddings =
    spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")

  test("cosine: identity = 1, orthogonal = 0, opposite = -1") {
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f), 1.0),
      (Array(1f, 0f), Array(0f, 1f), 0.0),
      (Array(1f, 0f), Array(-1f, 0f), -1.0)
    ).toDF("a", "b", "want")
    val got = df.select(Similarity.cosine($"a", $"b").as("c"), $"want")
      .as[(Double, Double)].collect()
    got.foreach { case (c, want) => assert(math.abs(c - want) < 1e-12) }
  }

  test("native cosine_sim expression is bit-identical to the HOF cosine") {
    val pairs = embeddings.as("x").crossJoin(embeddings.limit(3).as("y"))
      .select(
        Similarity.cosine($"x.embedding", $"y.embedding").as("hof"),
        Similarity.cosineNative($"x.embedding", $"y.embedding")
          .as("native"))
    // bitwise equality, not epsilon: both must fold in the same order
    assert(pairs.filter($"hof" =!= $"native" ||
      $"hof".isNull =!= $"native".isNull).count() == 0)
  }

  test("native cosine_sim rejects dimension mismatch") {
    val ex = intercept[Exception] {
      Seq((Array(1.0, 2.0), Array(1.0))).toDF("a", "b")
        .select(Similarity.cosineNative($"a", $"b")).collect()
    }
    assert(ex.getMessage.contains("dimension mismatch") ||
      Option(ex.getCause).exists(_.getMessage.contains("dimension mismatch")))
  }

  test("bruteForceTopK: ranks are 1..k per query, self excluded") {
    val res = Similarity.bruteForceTopK(embeddings,
      embeddings.filter($"vec_id" < 5), k = 3).collect()
    val byQuery = res.groupBy(_.getLong(0))
    assert(byQuery.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQuery.values.foreach { rows =>
      assert(rows.map(_.getInt(2)).sorted.toSeq == Seq(1, 2, 3))
      rows.foreach(r => assert(r.getLong(1) != r.getLong(0)))
    }
  }

  test("lshTopK recall@5 beats the bucket-fraction baseline (bits=4)") {
    val queries = embeddings.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(embeddings, queries, k = 5)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(embeddings, queries, k = 5,
      bits = 4, probeDist = 1)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall=$recall")
  }

  test("ivfTopK with nprobe = nlist equals brute force") {
    val queries = embeddings.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(embeddings, queries, k = 3)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(embeddings, queries, k = 3,
      nlist = 4, nprobe = 4)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    assert(ivf == exact)
  }

  test("ivfTopK partial probing keeps useful recall") {
    val queries = embeddings.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(embeddings, queries, k = 5)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(embeddings, queries, k = 5,
      nlist = 8, nprobe = 4)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall=$recall")
  }

  test("quantized scan + exact rescore: recall@3 >= 0.9 vs brute force") {
    val queries = embeddings.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(embeddings, queries, k = 3)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val quant = Similarity.quantizedTopK(embeddings, queries, k = 3,
      rescore = 9)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall=$recall")
  }

  test("quantized rescore with rescore = corpus equals brute force") {
    val queries = embeddings.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(embeddings, queries, k = 3)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val quant = Similarity.quantizedTopK(embeddings, queries, k = 3,
      rescore = 100000)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(quant == exact)
  }

  test("lshCosinePairs with exhaustive probing equals quadratic cosinePairs") {
    // tables=1, bits=1, probeDist=1: every pair is a candidate, so the
    // bucketed path must reproduce the exact quadratic result bit-for-bit
    val exact = Similarity.cosinePairs(embeddings, threshold = 0.3)
      .as[(Long, Long, Double)].collect().toSet
    val bucketed = Similarity.lshCosinePairs(embeddings, threshold = 0.3,
      bits = 1, probeDist = 1, tables = 1)
      .as[(Long, Long, Double)].collect().toSet
    assert(bucketed == exact)
    assert(exact.nonEmpty) // the threshold must actually select pairs
  }

  test("lshCosinePairs is precise (subset of quadratic) with useful recall") {
    val exact = Similarity.cosinePairs(embeddings, threshold = 0.3)
      .as[(Long, Long, Double)].collect().toSet
    val bucketed = Similarity.lshCosinePairs(embeddings, threshold = 0.3,
      bits = 4, probeDist = 1, tables = 4)
      .as[(Long, Long, Double)].collect().toSet
    // exact-cosine verify => no false positives, ever
    assert(bucketed.subsetOf(exact))
    val recall = bucketed.size.toDouble / exact.size
    assert(recall >= 0.5, s"recall=$recall (${bucketed.size}/${exact.size})")
  }

  test("lshCosinePairs emits each pair at most once (cross-table dedup)") {
    val pairs = Similarity.lshCosinePairs(embeddings, threshold = -1.0,
      bits = 4, probeDist = 2, tables = 3)
      .select("a", "b").as[(Long, Long)].collect()
    assert(pairs.length == pairs.toSet.size)
    pairs.foreach { case (a, b) => assert(a < b) }
  }

  test("lshTopK probeDist=2 probes the 2-bit neighborhood (recall >= 1-bit)") {
    val queries = embeddings.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(embeddings, queries, k = 5)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    def recallAt(probeDist: Int): Double = {
      val approx = Similarity.lshTopK(embeddings, queries, k = 5,
        bits = 6, probeDist = probeDist)
        .select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
      (exact & approx).size.toDouble / exact.size
    }
    // candidate sets are nested (2-bit flips ⊇ 1-bit flips) and ranking
    // is fully tiebroken, so recall is monotone in probeDist
    val r1 = recallAt(1)
    val r2 = recallAt(2)
    assert(r2 >= r1, s"probeDist=2 recall $r2 < probeDist=1 recall $r1")
    // and a 2-bit probe must really widen the candidate pool: full-width
    // probing (probeDist = bits) recovers brute force exactly
    val allProbes = Similarity.lshTopK(embeddings, queries, k = 5,
      bits = 3, probeDist = 3)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val exactK5 = exact
    assert(allProbes == exactK5)
  }

  test("lshTopK rejects probeDist out of range") {
    intercept[IllegalArgumentException] {
      Similarity.lshTopK(embeddings, embeddings.limit(1), k = 1,
        bits = 4, probeDist = 5)
    }
  }

  test("lshTopK with exhaustive probing equals brute force") {
    val queries = embeddings.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(embeddings, queries, k = 3)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    // 1 bit + 1-flip probe = both buckets probed -> identical result
    val approx = Similarity.lshTopK(embeddings, queries, k = 3,
      bits = 1, probeDist = 1)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    assert(approx == exact)
  }

  test("semanticDupes: hand-computed verdicts in a single cluster") {
    val vecs = Seq(
      (0L, Array(1f, 0f)),
      (1L, Array(1f, 0.01f)),  // near-dup of 0
      (2L, Array(0f, 1f)),     // orthogonal: unique
      (3L, Array(1f, 0.02f))   // near-dup of 0 AND 1 -> keeper is min = 0
    ).toDF("vec_id", "embedding")
    val got = Similarity
      .semanticDupes(vecs, threshold = 0.9, dim = 2, nlist = 1)
      .select($"vec_id", $"dup_of", $"is_dup")
      .as[(Long, Option[Long], Int)].collect().sortBy(_._1).toSeq
    assert(got == Seq((0L, None, 0), (1L, Some(0L), 1),
      (2L, None, 0), (3L, Some(0L), 1)))
  }

  test("semanticDupes among: pair space restricted to the given ids; " +
      "a keeper outside the restriction no longer causes a drop") {
    val vecs = Seq(
      (0L, Array(1f, 0f)),
      (1L, Array(1f, 0.01f)),  // near-dup of 0
      (2L, Array(0f, 1f)),     // orthogonal: unique
      (3L, Array(1f, 0.02f))   // near-dup of 0 AND 1
    ).toDF("vec_id", "embedding")
    // restrict to {1, 2, 3}: vector 0 is out of scope, so 1 becomes a
    // keeper and 3's keeper is now 1 (not the excluded 0); ids outside
    // the restriction don't appear at all
    val among = Seq(1L, 2L, 3L).toDF("vec_id")
    val got = Similarity
      .semanticDupes(vecs, threshold = 0.9, dim = 2, nlist = 1,
        among = Some(among))
      .select($"vec_id", $"dup_of", $"is_dup")
      .as[(Long, Option[Long], Int)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, None, 0), (2L, None, 0), (3L, Some(1L), 1)))
  }

  test("semanticDupes with nlist=1 equals the unclustered quadratic policy") {
    // one cluster -> every pair is in scope, so the verdict must match
    // the policy derived from exact cosinePairs on the same corpus
    val tau = 0.45
    val wantDupOf = Similarity.cosinePairs(embeddings, tau, native = true)
      .groupBy($"b".as("vec_id"))
      .agg(org.apache.spark.sql.functions.min($"a").as("dup_of"))
      .as[(Long, Long)].collect().toMap
    val got = Similarity.semanticDupes(embeddings, tau, nlist = 1,
        native = true)
      .select($"vec_id", $"dup_of")
      .as[(Long, Option[Long])].collect()
    assert(got.length > 0)
    got.foreach { case (id, dupOf) =>
      assert(dupOf == wantDupOf.get(id), s"vec $id") }
  }

  test("hardNegatives = bruteForceTopK over the cross-label corpus") {
    val queries = embeddings.filter($"vec_id" < 5)
    val got = Similarity.hardNegatives(embeddings, queries, k = 4,
        native = true)
      .select("query_id", "neighbor_id", "neighbor_label", "rank")
      .as[(Long, Long, Int, Int)].collect()
    assert(got.nonEmpty)
    // every neighbor's label differs from its query's label
    val labelOf = embeddings.select("vec_id", "label")
      .as[(Long, Int)].collect().toMap
    got.foreach { case (q, n, nl, _) =>
      assert(labelOf(n) == nl && nl != labelOf(q), s"query $q neighbor $n")
    }
    // and per query it's exactly brute-force top-k over the corpus
    // restricted to the other labels
    for (q <- 0L until 5L) {
      val want = Similarity.bruteForceTopK(
        embeddings.filter($"label" =!= lit(labelOf(q).toInt)),
        queries.filter($"vec_id" === q), k = 4, native = true)
        .select("neighbor_id", "rank").as[(Long, Int)].collect().toSet
      val mine = got.collect { case (`q`, n, _, r) => (n, r) }.toSet
      assert(mine == want, s"query $q")
    }
  }

  test("kCenterCoreset: matches a driver-side greedy reference") {
    val got = Similarity.kCenterCoreset(embeddings, k = 6, native = true)
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    // reference: same greedy on collected vectors with the same
    // rounding and tie-breaks
    val vecs = embeddings
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i) }
      math.rint(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e4) / 1e4
    }
    var picked = Vector((1, vecs.head._1, 1.0))
    var centers = Vector(vecs.head)
    for (i <- 2 to 6) {
      val cand = vecs.filter(v => !centers.exists(_._1 == v._1))
        .map(v => (v, centers.map(c => cos(v._2, c._2)).max))
      val best = cand.minBy { case (v, cover) => (cover, v._1) }
      picked :+= ((i, best._1._1, best._2))
      centers :+= best._1
    }
    assert(got.map(r => (r._1, r._2)).toSeq ==
      picked.map(p => (p._1, p._2)))
    // farthest-point property: cover sims of picks 2..k never
    // decrease (each added center only raises every point's cover,
    // and the previous argmin left the pool)
    got.drop(1).sliding(2).foreach {
      case Array(a, b) =>
        assert(b._3 >= a._3, s"ranks ${a._1}->${b._1}")
      case _ => ()
    }
    assert(got.drop(1).forall(_._3 < 1.0))
  }
}
