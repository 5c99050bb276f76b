package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def probe = (0L until 1000L).map(i => (i, i % 10))
    .toDF("k", "grp")
  private def build = Seq(3L, 17L, 555L, 999L).toDF("bk")

  test("bloom has zero false negatives: join result is exact") {
    val got = RuntimeFilter.bloomJoin(probe, build, "k", "bk", 1 << 10)
      .select("k").as[Long].collect().toSet
    assert(got == Set(3L, 17L, 555L, 999L))
  }

  test("prefilter actually reduces the probe side") {
    val bloom = RuntimeFilter.keyBloom(build, "bk", 1 << 10)
    val kept = probe.filter(bloom(col("k"))).count()
    assert(kept >= 4 && kept < 1000, s"kept=$kept")
  }

  test("keys never seen by the build side can still pass (fp) but all build keys pass") {
    val bloom = RuntimeFilter.keyBloom(build, "bk", 1 << 10)
    val buildKeysPass = build.filter(bloom(col("bk"))).count()
    assert(buildKeysPass == 4)
  }

  test("keyBloom rejects masks smaller than one 64-bit word") {
    // mBits in {1..32} used to allocate a zero-length words array and
    // throw AIOOBE on the first set bit; now it fails fast at require
    val e = intercept[IllegalArgumentException] {
      RuntimeFilter.keyBloom(build, "bk", 32)
    }
    assert(e.getMessage.contains("power of two >= 64"))
    // 64 is the smallest legal mask and must work end to end
    val bloom = RuntimeFilter.keyBloom(build, "bk", 64)
    assert(build.filter(bloom(col("bk"))).count() == 4)
  }

  test("the bloom filter sits on the probe scan, below the join") {
    // parquet-backed probe: over a LocalRelation the optimizer folds
    // the filter away entirely, which hides the shape under test
    val dir = java.nio.file.Files.createTempDirectory("rfprobe").toString
    probe.write.mode("overwrite").parquet(dir)
    val plan = RuntimeFilter.bloomJoin(spark.read.parquet(dir), build,
        "k", "bk", 1 << 10)
      .queryExecution.executedPlan.toString
    // the xxhash probe belongs to a Filter in the probe branch; the
    // join sees already-reduced input
    assert(plan.contains("xxhash64"), plan)
    val joinIdx = plan.indexOf("Join")
    val filterIdx = plan.indexOf("xxhash64")
    assert(joinIdx >= 0 && filterIdx > joinIdx, plan)
  }
}
