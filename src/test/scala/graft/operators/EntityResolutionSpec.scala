package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class EntityResolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  test("transitive merge, singleton clusters, min-id survivorship") {
    val records = Seq(
      (1L, "acme corp"), (2L, "acme corp."), (3L, "acme co"),
      (10L, "zeta llc"), (11L, "zeta llc"),
      (20L, "lonely ltd")
    ).toDF("rec_id", "name")
    // 1-2 and 2-3 matched (3 never compared to 1): transitivity must
    // still put all three in one cluster
    val matches = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val got = EntityResolution
      .resolve(records, "rec_id", "name", matches)
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set(
      (1L, 3L, "acme corp"),
      (10L, 2L, "zeta llc"),
      (20L, 1L, "lonely ltd")))
  }

  test("edge direction and duplicates do not change the result") {
    val records = Seq((1L, "x"), (2L, "y")).toDF("rec_id", "name")
    val a = EntityResolution.resolve(records, "rec_id", "name",
      Seq((1L, 2L)).toDF("a", "b"))
      .as[(Long, Long, String)].collect().toSet
    val b = EntityResolution.resolve(records, "rec_id", "name",
      Seq((2L, 1L), (1L, 2L), (2L, 1L)).toDF("a", "b"))
      .as[(Long, Long, String)].collect().toSet
    assert(a == b && a == Set((1L, 2L, "x")))
  }
}
