package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  // 90% of rows share key 1 (the hot key)
  private lazy val big = (1 to 1000).map(i =>
    (if (i % 10 == 0) i else 1, s"p$i")).toDF("k", "payload")
  private lazy val dim = Seq((1, "hot"), (10, "ten"), (20, "twenty"),
    (999, "unmatched-dim")).toDF("k", "name")

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("salted inner join returns exactly the plain join's rows") {
    val plain = big.join(dim, Seq("k"))
    val salted = SkewJoin.saltedEquiJoin(big, dim, Seq("k"), salt = 8)
    assert(canon(salted) == canon(plain))
  }

  test("salted left join preserves unmatched big-side rows") {
    val plain = big.join(dim, Seq("k"), "left_outer")
    val salted = SkewJoin.saltedEquiJoin(big, dim, Seq("k"), salt = 8,
      joinType = "left_outer")
    assert(canon(salted) == canon(plain))
  }

  test("salt actually spreads the hot key across sub-keys") {
    import org.apache.spark.sql.functions._
    val spread = big.filter($"k" === 1)
      .withColumn("_salt", pmod(hash(col("k"), col("payload")), lit(8)))
      .select("_salt").distinct().count()
    assert(spread > 1)
  }
}
