package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  // Two sub-languages with disjoint-ish vocabularies: "target" docs
  // speak apples, "raw background" docs speak rocks. A couple of
  // shared stopwords keep the distributions overlapping.
  private lazy val docs = Seq(
    (1L, "t", "apple banana apple cherry the and"),
    (2L, "t", "banana apple apple apple the"),
    (3L, "t", "cherry banana the and apple"),
    (4L, "r", "rock stone pebble the and"),
    (5L, "r", "stone rock rock granite the"),
    (6L, "r", "pebble granite rock and stone"),
    (7L, "r", "apple rock the"), // mixed doc
    (8L, "r", "")                // empty doc
  ).toDF("doc_id", "grp", "text")

  private lazy val target = docs.filter($"grp" === "t")

  test("target-vocabulary docs outscore background docs") {
    val scored = Dsir.score(docs, target, "doc_id", "text", buckets = 64)
      .select("doc_id", "n_tokens", "dsir_weight")
      .as[(Long, Int, Long)].collect().map(r => r._1 -> r._3).toMap
    val t = Seq(1L, 2L, 3L).map(scored)
    val r = Seq(4L, 5L, 6L).map(scored)
    assert(t.min > r.max,
      s"target weights $t should all exceed background weights $r")
    // mixed doc sits between the pure blocks
    assert(scored(7L) < t.min && scored(7L) > r.min)
  }

  test("empty doc scores 0 with 0 tokens and survives the scan") {
    val scored = Dsir.score(docs, target, "doc_id", "text", buckets = 64)
    val row = scored.filter($"doc_id" === 8L)
      .select("n_tokens", "dsir_weight").as[(Int, Long)].head()
    assert(row == ((0, 0L)))
  }

  test("weights are exact integers: invariant under repartitioning") {
    val a = Dsir.score(docs, target, "doc_id", "text", buckets = 64)
      .select("doc_id", "dsir_weight").as[(Long, Long)].collect().toMap
    val b = Dsir.score(docs.repartition(7), target.repartition(3),
        "doc_id", "text", buckets = 64)
      .select("doc_id", "dsir_weight").as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("select keeps exactly the docs with non-negative mean score") {
    val scored = Dsir.score(docs, target, "doc_id", "text", buckets = 64)
      .select("doc_id", "n_tokens", "dsir_weight")
      .as[(Long, Int, Long)].collect()
    val expect = scored.collect {
      case (id, n, w) if n > 0 && math.floor(w.toDouble / n) >= 0 => id
    }.toSet
    val got = Dsir.select(docs, target, "doc_id", "text", buckets = 64)
      .select("doc_id").as[Long].collect().toSet
    assert(got == expect)
    // Semantic separation (target ⊂ raw dilutes the ratios, so the
    // crisp margin sits below 0 on this toy): a mean threshold of
    // −0.1 nats/token keeps every pure-target doc and drops every
    // background doc including the mixed one.
    val sep = Dsir.select(docs, target, "doc_id", "text", buckets = 64,
        minMeanMicroNats = -100000L)
      .select("doc_id").as[Long].collect().toSet
    assert(sep == Set(1L, 2L, 3L))
  }

  test("one-pass flag training equals the two-frame path bit-for-bit " +
      "(null flags count as false, matching filter semantics)") {
    val withNull = docs.withColumn("grp",
      when($"doc_id" === 6L, lit(null).cast("string"))
        .otherwise($"grp"))
    val twoFrame = Dsir.scoreArray(withNull.filter($"grp" === "t"),
      withNull, "text", buckets = 64)
    val onePass = Dsir.scoreArrayByFlag(withNull, $"grp" === "t",
      "text", buckets = 64)
    assert(onePass.toSeq == twoFrame.toSeq)
    val selTwo = Dsir.select(withNull, withNull.filter($"grp" === "t"),
        "doc_id", "text", buckets = 64, minMeanMicroNats = -100000L)
      .select("doc_id").as[Long].collect().toSet
    val selFlag = Dsir.selectByFlag(withNull, $"grp" === "t",
        "doc_id", "text", buckets = 64, minMeanMicroNats = -100000L)
      .select("doc_id").as[Long].collect().toSet
    assert(selFlag == selTwo)
  }

  test("scoreArray is dense, bounded, and bucket-aligned") {
    val arr = Dsir.scoreArray(target, docs, "text", buckets = 32)
    assert(arr.length == 32)
    // a bucket holding only target mass scores positive; one holding
    // only background mass scores negative — find them via the same
    // hash the operator uses
    val bucketOf = docs.sparkSession.range(1)
      .select(Dsir.bucket(lit("apple"), 32).as("a"),
        Dsir.bucket(lit("granite"), 32).as("g"))
      .as[(Long, Long)].head()
    assert(arr(bucketOf._1.toInt) > 0, "apple bucket should be target-like")
    assert(arr(bucketOf._2.toInt) < 0, "granite bucket should be raw-like")
  }
}
