package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global dictionary encoding for low-cardinality string columns —
  * ClickHouse's `LowCardinality(String)` / dictionary codec as an
  * explicit operator pair.
  *
  * The reference maps every MySQL string type to a plain ClickHouse
  * `String` (river/river.go CH type mapping); the engine-side
  * optimization users layer on top is `LowCardinality`, which
  * substitutes a dense integer code per distinct value and runs
  * comparisons, GROUP BYs and shuffles on the codes. These operators
  * make that dictionary explicit and portable: build once, broadcast
  * everywhere, aggregate on 4-byte codes instead of strings.
  *
  * Scale shape: `build` is one scan with map-side partial counting —
  * the exchange carries at most one row per distinct value per task,
  * and the dictionary itself is distinct-values-sized (the
  * low-cardinality contract), so `encode`'s join always broadcasts
  * (hinted explicitly; no shuffle of the fact table). Downstream
  * aggregations then hash 4-byte ints, not arbitrary-length UTF-8 —
  * at 100 TB that's the difference between a shuffle keyed on short
  * fixed-width values and one dominated by string bytes. Code
  * assignment is frequency-descending (hottest value = smallest
  * code, the engine's own layout heuristic) with value-ascending
  * tiebreak, so the dictionary is a pure function of the data. */
object Dict {

  /** `(code, value, n)` — dense codes from 1, ordered by (count desc,
    * value asc). Deterministic: ties cannot reorder. */
  def build(df: DataFrame, valueCol: String): DataFrame = {
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("value"))
      .agg(count(lit(1)).as("n"))
    counts.withColumn("code",
        row_number().over(Window.orderBy(col("n").desc, col("value").asc)))
      .select(col("code"), col("value"), col("n"))
  }

  /** Adds `codeCol` (int code; null input → null code) by
    * broadcast-joining the dictionary — the fact side keeps its
    * partitioning, no shuffle. Values absent from the dictionary
    * (schema drift after build) keep a null code rather than failing,
    * mirroring LowCardinality's on-the-fly dictionary growth being a
    * separate, explicit `build` refresh here. */
  def encode(df: DataFrame, valueCol: String, dict: DataFrame,
      codeCol: String = "code"): DataFrame = {
    // unique join-key alias: the fact table may itself have a "value"
    // column unrelated to the encoded one
    val d = dict.select(col("value").as("__dict_value"),
      col("code").as(codeCol))
    df.join(broadcast(d), df(valueCol) === col("__dict_value"), "left")
      .drop("__dict_value")
  }

  /** Restores the string column from codes — the read path. */
  def decode(df: DataFrame, codeCol: String, dict: DataFrame,
      valueCol: String = "value"): DataFrame =
    df.join(broadcast(dict.select(col("code").as(codeCol),
        col("value").as(valueCol))), Seq(codeCol), "left")
}
