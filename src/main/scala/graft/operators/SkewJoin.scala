package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A shuffle join hashes rows to reducers by join key, so one hot key
  * (a celebrity user, a default value, an empty-string sentinel) lands
  * an entire partition on one task. AQE's skew-join split handles many
  * cases at runtime; salting is the explicit, planner-independent form
  * for when the skew is known and extreme — the standard technique a
  * 100 TB merge/enrichment pipeline keeps in its toolbox.
  *
  * Mechanics: the big side appends a deterministic salt in [0, salt)
  * derived from a hash of the whole row, splitting each hot key into
  * `salt` sub-keys; the small side is exploded `salt`× so every sub-key
  * still finds its match. Result rows are identical to the unsalted
  * join — only the shuffle distribution changes. The small side grows
  * `salt`×, so pick `salt` ≈ (hot-key rows) / (target rows per task).
  */
object SkewJoin {

  /** Deterministic salt from every column of the row (NOT just the join
    * key — that would put the whole hot key in one salt bucket again). */
  private def saltCol(df: DataFrame, salt: Int): Column =
    pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(salt))

  /** Inner/left equi-join of a skewed big side against a small side,
    * salted `salt` ways. Supported joinType: inner, left_outer. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt >= 1)
    require(joinType == "inner" || joinType == "left_outer",
      s"unsupported join type for salting: $joinType")
    val bigS = big.withColumn("_salt", saltCol(big, salt))
    val smallS = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS, keys :+ "_salt", joinType).drop("_salt")
  }
}
