package graft.operators

import graft.model.ChangeEvent
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic CDC feeds over the driver testdata.
  *
  * The reference's events come from the MySQL binlog (one RowsEvent per
  * change, reference: river/sync.go:72-102); for oracle-checked tests the
  * engine synthesizes an equivalent ordered I/U/D stream arithmetically
  * from the `orders` table so a SQL oracle can replay the identical stream.
  *
  * Feed shape (FIXTURES.md §B): payload columns of `orders` plus
  * `_op` ∈ {I,U,D} and a monotonic `_seq`.
  *
  * Event rules (pure functions of o_orderkey, so both engines agree):
  *   - every order row    → I at seq = key*10 (the snapshot replay; the
  *     reference replays mysqldump rows as inserts, river/river.go:135-145)
  *   - key % 7 == 0       → U at seq = key*10+1: totalprice += 1000,
  *     status 'U' on odd keys only (exercises changed-cols sparsity)
  *   - key % 11 == 0      → D at seq = key*10+2
  */
object ChangeFeed {
  import ChangeEvent.{OpCol, SeqCol}

  val keyCols: Seq[String] = Seq("o_orderkey")
  val payloadCols: Seq[String] = Seq("o_orderkey", "o_custkey",
    "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")

  def orders(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select(payloadCols.map(col): _*)

  private def k = col("o_orderkey")

  def inserts(spark: SparkSession, sfDir: String): DataFrame =
    orders(spark, sfDir)
      .withColumn(OpCol, lit("I"))
      .withColumn(SeqCol, k * 10)

  /** Updated after-image: totalprice += 1000 always; status → 'U' only on
    * odd keys (even-key updates leave status unchanged). */
  def updates(spark: SparkSession, sfDir: String): DataFrame =
    orders(spark, sfDir)
      .filter(k % 7 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
      .withColumn("o_orderstatus",
        when(k % 2 === 1, lit("U")).otherwise(col("o_orderstatus")))
      .withColumn(OpCol, lit("U"))
      .withColumn(SeqCol, k * 10 + 1)

  def deletes(spark: SparkSession, sfDir: String): DataFrame = {
    val base = orders(spark, sfDir)
    val schema = base.schema // one metadata read, reused for every column
    base
      .filter(k % 11 === 0)
      .select(
        (keyCols.map(col) ++
          payloadCols.filterNot(keyCols.contains)
            .map(c => lit(null).cast(schema(c).dataType).as(c))): _*)
      .withColumn(OpCol, lit("D"))
      .withColumn(SeqCol, k * 10 + 2)
  }

  /** Full I/U/D stream — identical rows to
    * inserts ∪ updates ∪ deletes, but generated from ONE scan of the
    * source: each order row explodes into its 1-3 events (the union form
    * scans the parquet three times). */
  def full(spark: SparkSession, sfDir: String): DataFrame = {
    val base = orders(spark, sfDir)
    val types = base.schema
    def ev(op: String, seqOff: Int, cols: Seq[Column]): Column =
      struct((cols :+ lit(op).as(OpCol) :+ (k * 10 + seqOff).as(SeqCol)): _*)
    val insertCols = payloadCols.map(col)
    val updateCols = payloadCols.map {
      case "o_totalprice" => (col("o_totalprice") + lit(1000.0))
        .as("o_totalprice")
      case "o_orderstatus" => when(k % 2 === 1, lit("U"))
        .otherwise(col("o_orderstatus")).as("o_orderstatus")
      case c => col(c)
    }
    val deleteCols = payloadCols.map { c =>
      if (keyCols.contains(c)) col(c)
      else lit(null).cast(types(c).dataType).as(c)
    }
    base.select(explode(filter(array(
      ev("I", 0, insertCols),
      when(k % 7 === 0, ev("U", 1, updateCols)),
      when(k % 11 === 0, ev("D", 2, deleteCols))),
      e => e.isNotNull)).as("e"))
      .select(col("e.*"))
  }

  /** The same full feed in generic-envelope form (string-encoded values,
    * SURVEY §1.2): one untyped stream as the binlog reader would emit it,
    * for exercising the envelope-then-cast path end-to-end. */
  def fullEnvelope(spark: SparkSession, sfDir: String): DataFrame = {
    val f = full(spark, sfDir)
    val valueCols = payloadCols.flatMap(c =>
      Seq(lit(c), col(c).cast("string")))
    val keyPairs = keyCols.flatMap(c => Seq(lit(c), col(c).cast("string")))
    f.select(
      col(SeqCol).as("seq"),
      col(SeqCol).as("tsMs"),
      lit("tpch").as("schema"),
      lit("orders").as("table"),
      col(OpCol).as("op"),
      map(keyPairs: _*).as("key"),
      lit(null).cast("map<string,string>").as("before"),
      when(col(OpCol) =!= "D", map(valueCols: _*))
        .otherwise(lit(null).cast("map<string,string>")).as("after"))
  }

  /** Update events with both row images (the binlog's before/after pair,
    * reference: river/sync.go:214-240), for the changed-cols operator. */
  def updatePairs(spark: SparkSession, sfDir: String): DataFrame = {
    val base = orders(spark, sfDir).filter(k % 7 === 0)
    val valueStruct = struct(payloadCols.filterNot(keyCols.contains)
      .map(col): _*)
    base.select(
      k,
      valueStruct.as("before"),
      struct(
        col("o_custkey"),
        when(k % 2 === 1, lit("U")).otherwise(col("o_orderstatus"))
          .as("o_orderstatus"),
        (col("o_totalprice") + lit(1000.0)).as("o_totalprice"),
        col("o_orderdate"),
        col("o_orderpriority")).as("after"))
  }
}
