package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private lazy val ids = (1L to 2000L).toDF("id")

  test("hashSplit is a partition: every row gets exactly one label") {
    val out = Sampling.hashSplit(ids, "id",
      Seq("train" -> 8, "eval" -> 1, "test" -> 1))
    assert(out.count() == 2000)
    assert(out.filter($"split".isNull).count() == 0)
    val byLabel = out.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(byLabel.keySet == Set("train", "eval", "test"))
    // ~80/10/10 with hash noise
    assert(byLabel("train") > 1500 && byLabel("train") < 1900)
  }

  test("assignment is deterministic and insertion-stable") {
    val first = Sampling.hashSplit(ids, "id", Seq("a" -> 1, "b" -> 1))
      .as[(Long, String)].collect().toMap
    val again = Sampling.hashSplit(ids, "id", Seq("a" -> 1, "b" -> 1))
      .as[(Long, String)].collect().toMap
    assert(first == again)
    // adding rows never moves existing rows between splits
    val grown = Sampling.hashSplit((1L to 4000L).toDF("id"), "id",
      Seq("a" -> 1, "b" -> 1)).as[(Long, String)].collect().toMap
    assert(ids.as[Long].collect().forall(i => grown(i) == first(i)))
  }

  test("sampleByHash hits the requested fraction within hash noise") {
    val n = Sampling.sampleByHash(ids, "id", 0.25).count()
    assert(n > 400 && n < 600, s"got $n of 2000 at fraction 0.25")
    assert(Sampling.sampleByHash(ids, "id", 0.0).count() == 0)
    assert(Sampling.sampleByHash(ids, "id", 1.0).count() == 2000)
  }

  test("shardId covers [0, shards) and matches the md5 definition") {
    val shards = ids.select(Sampling.shardId($"id", 16).as("s"))
      .distinct().as[Long].collect().toSet
    assert(shards == (0L until 16L).toSet)
    val manual = ids
      .withColumn("expect",
        pmod(conv(substring(md5($"id".cast("string")), 1, 15), 16, 10)
          .cast("long"), lit(16L)))
      .filter(Sampling.shardId($"id", 16) =!= $"expect").count()
    assert(manual == 0)
  }

  test("weightedSampleByHash: keep rate tracks the weight, replay-stable") {
    val rows = (1L to 4000L).map(i => (i, (i % 4) * 0.25)).toDF("id", "w")
    val kept = Sampling.weightedSampleByHash(rows, "id", $"w", rate = 1.0)
    // per-weight empirical keep rates: ~0, ~.25, ~.5, ~.75 (±5pp over
    // 1000 trials per class)
    val byW = kept.groupBy("w").count().as[(Double, Long)].collect().toMap
    assert(!byW.contains(0.0))
    for ((w, expect) <- Seq(0.25 -> 250.0, 0.5 -> 500.0, 0.75 -> 750.0))
      assert(math.abs(byW(w) - expect) < 50, s"w=$w got ${byW(w)}")
    // weight 1 + rate 1 keeps everything; determinism: re-run identical
    val all = Sampling.weightedSampleByHash(rows, "id", lit(1.0), 1.0)
    assert(all.count() == 4000)
    assert(kept.select("id").as[Long].collect().toSet ==
      Sampling.weightedSampleByHash(rows, "id", $"w", 1.0)
        .select("id").as[Long].collect().toSet)
  }

  test("trainingOrder is a contiguous permutation, shard-parallel") {
    val out = Sampling.trainingOrder(ids, "id", shards = 16)
    // global_pos is a bijection onto 1..N
    val pos = out.select("global_pos").as[Long].collect().sorted
    assert(pos.toSeq == (1L to 2000L))
    // (shard, pos) lexicographic == global_pos order
    val lex = out.orderBy("shard", "pos").select("global_pos")
      .as[Long].collect()
    assert(lex.toSeq == (1L to 2000L))
    // the permutation is decorrelated from the source order: the ids
    // at the first 100 positions are nothing like 1..100
    val first = out.filter($"global_pos" <= 100).select("id")
      .as[Long].collect().toSet
    assert((first & (1L to 100L).toSet).size < 20)
    // no global single-reducer sort: the rank window partitions by
    // shard, so the plan's window exchange is hashpartitioning, not a
    // rangepartitioning of the whole frame
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"), plan)
  }

  test("salted trainingOrder: fresh decorrelated permutation per epoch") {
    def posMap(salt: String): Map[Long, Long] =
      Sampling.trainingOrder(ids, "id", shards = 16, salt = salt)
        .select("id", "global_pos").as[(Long, Long)].collect().toMap
    val e1 = posMap("epoch1")
    val e2 = posMap("epoch2")
    // each salt is a bijection onto 1..N (the contiguity identity holds
    // per salt) and replays identically
    assert(e1.values.toSeq.sorted == (1L to 2000L))
    assert(e2.values.toSeq.sorted == (1L to 2000L))
    assert(posMap("epoch1") == e1)
    // distinct salts give decorrelated orders: almost no id keeps its
    // position, and epoch 2 is a fresh GLOBAL shuffle (shard
    // assignment moves too), not a within-shard reshuffle
    val fixed = e1.count { case (id, p) => e2(id) == p }
    assert(fixed < 20, s"$fixed ids kept their position across salts")
    def shardMap(salt: String): Map[Long, Long] =
      Sampling.trainingOrder(ids, "id", shards = 16, salt = salt)
        .select("id", "shard").as[(Long, Long)].collect().toMap
    val moved = shardMap("epoch1").toSeq
      .count { case (id, s) => shardMap("epoch2")(id) != s }
    assert(moved > 1500, s"only $moved ids changed shard across salts")
    // empty salt = the unsalted permutation, bit for bit
    assert(posMap("") == Sampling.trainingOrder(ids, "id", shards = 16)
      .select("id", "global_pos").as[(Long, Long)].collect().toMap)
  }

  test("temperatureSampleByHash flattens the domain distribution") {
    // skewed corpus: head domain 6400 rows, tail 400
    val rows = ((1L to 6400L).map(i => (i, "head")) ++
      (6401L to 6800L).map(i => (i, "tail"))).toDF("id", "dom")
    val kept = Sampling.temperatureSampleByHash(
      rows, "id", "dom", alpha = 0.5, targetFrac = 0.5)
    val by = kept.groupBy("dom").count().as[(String, Long)].collect().toMap
    // derive the exact expected thresholds the operator promises
    val (nh, nt) = (6400.0, 400.0)
    val z = math.pow(nh, 0.5) + math.pow(nt, 0.5)
    def rate(n: Double) =
      math.min(1.0, 6800.0 * 0.5 * math.pow(n, 0.5) / z / n)
    // tail keep-rate must exceed head keep-rate (flattening), and the
    // empirical rates must track the derived ones within hash noise
    assert(rate(nt) > rate(nh))
    assert(math.abs(by("head").toDouble / nh - rate(nh)) < 0.05)
    assert(math.abs(by("tail").toDouble / nt - rate(nt)) < 0.1)
    // schema is the input schema (helper columns dropped), replay-stable
    assert(kept.columns.toSeq == Seq("id", "dom"))
    val again = Sampling.temperatureSampleByHash(
      rows, "id", "dom", alpha = 0.5, targetFrac = 0.5)
      .as[(Long, String)].collect().toSet
    assert(again == kept.as[(Long, String)].collect().toSet)
    // alpha = 1 is plain proportional sampling: every domain same rate,
    // overall fraction ~targetFrac
    val prop = Sampling.temperatureSampleByHash(
      rows, "id", "dom", alpha = 1.0, targetFrac = 0.5)
    assert(math.abs(prop.count() / 6800.0 - 0.5) < 0.05)
  }

  test("temperatureUpsampleByHash repeats tail domains, caps nothing") {
    val rows = ((1L to 6400L).map(i => (i, "head")) ++
      (6401L to 6800L).map(i => (i, "tail"))).toDF("id", "dom")
    val out = Sampling.temperatureUpsampleByHash(
      rows, "id", "dom", alpha = 0.5, targetMult = 1.0)
    // derived rates: rate_d = N·√n_d / Z / n_d (no cap)
    val (nh, nt) = (6400.0, 400.0)
    val z = math.sqrt(nh) + math.sqrt(nt)
    def rate(n: Double) = 6800.0 * 1.0 * math.sqrt(n) / z / n
    assert(rate(nt) > 1.0 && rate(nh) < 1.0) // tail upsamples, head cuts
    val by = out.groupBy("dom").count().as[(String, Long)].collect().toMap
    // expected volume = rate·n within hash noise
    assert(math.abs(by("head") / nh - rate(nh)) < 0.05)
    assert(math.abs(by("tail") / nt - rate(nt)) < 0.15)
    // per-row copy counts are floor(rate) or floor(rate)+1, and
    // rep_idx is contiguous 1..rep for every kept row: min 1, max n,
    // all distinct — together these pin the exact set {1..n}
    val reps = out.groupBy("id").agg(
        count(lit(1)).as("n"), min("rep_idx").as("mn"),
        max("rep_idx").as("mx"), countDistinct("rep_idx").as("nd"))
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(reps.forall { case (_, n, mn, mx, nd) =>
      mn == 1 && mx == n && nd == n })
    val tailReps = out.filter($"dom" === "tail").groupBy("id").count()
      .as[(Long, Long)].collect().map(_._2).toSet
    val base = math.floor(rate(nt)).toLong
    assert(tailReps.subsetOf(Set(base, base + 1)))
    // deterministic replay
    val again = Sampling.temperatureUpsampleByHash(
      rows, "id", "dom", alpha = 0.5, targetMult = 1.0)
      .as[(Long, String, Long)].collect().toSet
    assert(again == out.as[(Long, String, Long)].collect().toSet)
  }

  test("writeShards produces one file per shard and loses no rows") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_shards_").toString
    val df = (1L to 500L).map(i => (i, s"doc$i")).toDF("id", "text")
    Sampling.writeShards(df, "id", shards = 8, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 500)
    assert(back.select("shard").distinct().count() == 8)
    // round trip: identical content
    assert(back.select("id", "text").as[(Long, String)].collect().toSet ==
      df.as[(Long, String)].collect().toSet)
    // one data file per shard directory
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard="))
    assert(shardDirs.length == 8)
    assert(shardDirs.forall(
      _.listFiles().count(_.getName.endsWith(".parquet")) == 1))
  }

  test("writeShards contents = trainingOrder row-for-row, in file order") {
    // the writer path (partitionBy + sortWithinPartitions) must emit
    // exactly the (shard, pos) layout trainingOrder assigns — shard
    // membership AND in-file row order — for the unsalted and a salted
    // permutation alike
    val df = (1L to 500L).map(i => (i, s"doc$i")).toDF("id", "text")
    for (salt <- Seq("", "epoch-7")) {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_shards_order_").toString
      Sampling.writeShards(df, "id", shards = 8, dir, salt = salt)
      val want = Sampling.trainingOrder(df, "id", shards = 8, salt = salt)
      (0 until 8).foreach { k =>
        // a single-file read returns rows in file order
        val got = spark.read.parquet(s"$dir/shard=$k")
          .select("id").collect().map(_.getLong(0)).toSeq
        val expect = want.filter($"shard" === k).orderBy($"pos")
          .select("id").collect().map(_.getLong(0)).toSeq
        assert(got == expect, s"salt='$salt' shard=$k diverges")
      }
    }
  }
}
