package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — each left row picks ONE right row of the same
  * key: the latest right row at-or-before the left row's timestamp
  * (backward), or the earliest at-or-after (forward). The reference
  * engine has no such operator; time-series state lookup is a standard
  * analytics need (kdb `aj`, DuckDB `ASOF JOIN`, Flink temporal join)
  * and Spark lacks a built-in, so this is the composed-operator form
  * recommended by the build notes: no custom physical plan needed.
  *
  * Implementation is the union-and-running-window trick, NOT a range
  * join: tag right rows 0 and left rows 1, union them, and take
  * `last(payload, ignoreNulls)` over a running window ordered by
  * (ts, tag, tiebreak). One shuffle on the key, one sort — the same
  * cost as a co-partitioned merge join, with no inequality-join
  * explosion (a naive `l.ts >= r.ts` join is O(|l|·|r|) per key and
  * falls off Spark's equi-join fast path entirely).
  *
  * At 100 TB this scales as a single hash-partitioned sort: state per
  * task is one running struct, not the right-side history. A very hot
  * key concentrates its rows in one task (inherent to per-key ordering);
  * [[asofBucketed]] is the pre-split for that shape: partition by
  * (key, coarse-time-bucket) and carry each bucket's opening state via a
  * per-(key, bucket) boundary row, so a hot key runs as many tasks as it
  * spans buckets.
  *
  * Tie semantics (deterministic, engine-independent): among right rows
  * sharing (key, ts), the one with the greatest `tiebreak` wins; at
  * equal left/right ts the right row IS visible (at-or-before /
  * at-or-after). No null ordering is relied on — the tiebreak column is
  * coalesced to a constant on the left side.
  *
  * Working columns are prefixed `_gaj_` and guarded: inputs already
  * containing such names (or a plain `_ts`-style collision) are rejected
  * loudly instead of silently mis-unioning.
  */
object AsofJoin {

  private val Wc = "_gaj_" // internal working-column prefix
  private def guard(left: DataFrame, right: DataFrame): Unit = {
    val clash = (left.columns ++ right.columns).filter(_.startsWith(Wc))
    require(clash.isEmpty,
      s"asof: input columns ${clash.mkString(",")} collide with the " +
        s"operator's internal '$Wc' prefix — rename them first")
  }

  /** @param payload  right columns carried to the output (prefixed)
    * @param tiebreak right column ordering rows within an equal (key,ts)
    *                 group — must be non-null on the right side
    * @param forward  false = latest right at-or-before left.ts;
    *                 true = earliest right at-or-after left.ts
    */
  def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      tiebreak: String, prefix: String = "r_",
      forward: Boolean = false): DataFrame = {
    guard(left, right)
    val leftCols = left.columns.toSeq
    val keys = keyCols.map(col)
    val rStruct = right.select((payload :+ rightTs).map(col): _*).schema
    val lTagged = left.select(
      keys ++ Seq(
        col(leftTs).as(s"${Wc}ts"), lit(1).as(s"${Wc}tag"),
        lit(0L).as(s"${Wc}tb"),
        struct(leftCols.map(col): _*).as(s"${Wc}l"),
        lit(null).cast(rStruct).as(s"${Wc}r")): _*)
    val rTagged = right.select(
      keys ++ Seq(
        col(rightTs).as(s"${Wc}ts"), lit(0).as(s"${Wc}tag"),
        col(tiebreak).cast("long").as(s"${Wc}tb"),
        lit(null).cast(lTagged.schema(s"${Wc}l").dataType).as(s"${Wc}l"),
        struct((payload :+ rightTs).map(col): _*).as(s"${Wc}r")): _*)
    // forward = backward on the reversed time axis: flip the ordering
    // and keep "last non-null wins"; the tag still sorts right rows
    // on the visible side of equal-ts left rows.
    val ordering: Seq[Column] =
      if (forward)
        Seq(col(s"${Wc}ts").desc, col(s"${Wc}tag").asc,
          col(s"${Wc}tb").asc)
      else
        Seq(col(s"${Wc}ts").asc, col(s"${Wc}tag").asc,
          col(s"${Wc}tb").asc)
    val w = Window.partitionBy(keys: _*).orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lTagged.unionByName(rTagged)
      .withColumn(s"${Wc}m",
        last(col(s"${Wc}r"), ignoreNulls = true).over(w))
      .filter(col(s"${Wc}tag") === 1)
    val outL = leftCols.map(c => col(s"${Wc}l.$c").as(c))
    val outR = (payload :+ rightTs)
      .map(c => col(s"${Wc}m.$c").as(s"$prefix$c"))
    matched.select(outL ++ outR: _*)
  }

  /** Hot-key pre-split variant of [[asof]]: identical semantics, but the
    * running window partitions on (key, coarse time bucket) instead of
    * key alone, so one hot key runs as `span / bucketWidth` parallel
    * tasks instead of one.
    *
    * Each bucket's opening state (the winning right row from all EARLIER
    * buckets) is materialized as one boundary row per (key, bucket) and
    * unioned in ahead of the bucket's own rows. The boundary rows are
    * computed with the same union-window trick one level up, on the
    * per-(key, bucket) summary frame — rows-per-key there = buckets
    * spanned, bounded by `timespan / bucketWidth`, thousands not
    * billions, so its per-key window is never the bottleneck.
    *
    * Cost: two shuffles ((key) on the tiny summary, (key, bucket) on the
    * data) vs [[asof]]'s one — pay it when key skew is the risk, e.g.
    * a device that never stops emitting. `forward` is handled by
    * negating the time axis, which reduces it to the backward problem
    * exactly (same tie semantics: greatest tiebreak wins).
    *
    * @param bucketWidth coarse bucket width in the timestamp's own unit;
    *                    choose so one key's rows per bucket fit a task
    */
  def asofBucketed(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      tiebreak: String, prefix: String = "r_", forward: Boolean = false,
      bucketWidth: Long = 86400L): DataFrame = {
    guard(left, right)
    require(bucketWidth > 0, s"bucketWidth=$bucketWidth must be positive")
    val leftCols = left.columns.toSeq
    val keys = keyCols.map(col)
    val keyNames = keyCols
    val rStruct = right.select((payload :+ rightTs).map(col): _*).schema

    // unified time axis: forward = backward over negated timestamps.
    // Timestamps map to unix micros (a long cast would TRUNCATE to
    // seconds and reorder sub-second events); integral columns pass
    // through. bucketWidth is therefore in µs for timestamp inputs.
    def toLong(c: Column, dt: org.apache.spark.sql.types.DataType)
        : Column = dt match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(c)
      case _ => c.cast("long")
    }
    val lDt = left.schema(leftTs).dataType
    val rDt = right.schema(rightTs).dataType
    def sts(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
      if (forward) -toLong(c, dt) else toLong(c, dt)
    // exact negative-safe floor division (RangeJoin.scala idiom): pmod
    // is non-negative, `div` is integral — exact at all long magnitudes
    def bucketOf(s: Column): Column =
      call_function("div", s - pmod(s, lit(bucketWidth)), lit(bucketWidth))

    val lTagged = left.select(
      keys ++ Seq(
        bucketOf(sts(col(leftTs), lDt)).as(s"${Wc}bkt"),
        sts(col(leftTs), lDt).as(s"${Wc}ts"), lit(1).as(s"${Wc}tag"),
        lit(0L).as(s"${Wc}tb"),
        struct(leftCols.map(col): _*).as(s"${Wc}l"),
        lit(null).cast(rStruct).as(s"${Wc}r")): _*)
    val rTagged = right.select(
      keys ++ Seq(
        bucketOf(sts(col(rightTs), rDt)).as(s"${Wc}bkt"),
        sts(col(rightTs), rDt).as(s"${Wc}ts"), lit(0).as(s"${Wc}tag"),
        col(tiebreak).cast("long").as(s"${Wc}tb"),
        lit(null).cast(lTagged.schema(s"${Wc}l").dataType).as(s"${Wc}l"),
        struct((payload :+ rightTs).map(col): _*).as(s"${Wc}r")): _*)

    // per-(key, bucket) summary of the right side: the bucket's winning
    // (last) payload — one row per key-bucket, data-sized nowhere
    val rSummaryW = Window.partitionBy((keys :+ col(s"${Wc}bkt")): _*)
      .orderBy(col(s"${Wc}ts").asc, col(s"${Wc}tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val rSummary = rTagged
      .withColumn(s"${Wc}last", last(col(s"${Wc}r")).over(rSummaryW))
      .groupBy((keys :+ col(s"${Wc}bkt")): _*)
      .agg(first(col(s"${Wc}last")).as(s"${Wc}r"))

    // buckets that NEED an opening state: every (key, bucket) seen on
    // either side (a left-only bucket still needs the carry)
    val needed = lTagged.select((keys :+ col(s"${Wc}bkt")): _*)
      .union(rTagged.select((keys :+ col(s"${Wc}bkt")): _*))
      .distinct()

    // the same union-window trick on the summary frame: need-rows (tag 0)
    // sort BEFORE the same bucket's summary (tag 1), so each need-row
    // sees exactly the strictly-earlier buckets' last state
    val carryW = Window.partitionBy(keys: _*)
      .orderBy(col(s"${Wc}bkt").asc, col(s"${Wc}ctag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carries = needed
      .select(keys ++ Seq(col(s"${Wc}bkt"), lit(0).as(s"${Wc}ctag"),
        lit(null).cast(rStruct).as(s"${Wc}r")): _*)
      .unionByName(rSummary.select(keys ++ Seq(col(s"${Wc}bkt"),
        lit(1).as(s"${Wc}ctag"), col(s"${Wc}r")): _*))
      .withColumn(s"${Wc}carry",
        last(col(s"${Wc}r"), ignoreNulls = true).over(carryW))
      .filter(col(s"${Wc}ctag") === 0 && col(s"${Wc}carry").isNotNull)
      // boundary row: sorts before every in-bucket row (tag -1 breaks
      // the tie against real right rows at the exact bucket start)
      .select(keys ++ Seq(col(s"${Wc}bkt"),
        (col(s"${Wc}bkt") * lit(bucketWidth)).as(s"${Wc}ts"),
        lit(-1).as(s"${Wc}tag"), lit(0L).as(s"${Wc}tb"),
        lit(null).cast(lTagged.schema(s"${Wc}l").dataType).as(s"${Wc}l"),
        col(s"${Wc}carry").as(s"${Wc}r")): _*)

    // the data-sized window now partitions on (key, bucket): a hot key
    // spans as many tasks as buckets
    val w = Window.partitionBy((keys :+ col(s"${Wc}bkt")): _*)
      .orderBy(col(s"${Wc}ts").asc, col(s"${Wc}tag").asc,
        col(s"${Wc}tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lTagged.unionByName(rTagged).unionByName(carries)
      .withColumn(s"${Wc}m",
        last(col(s"${Wc}r"), ignoreNulls = true).over(w))
      .filter(col(s"${Wc}tag") === 1)
    val outL = leftCols.map(c => col(s"${Wc}l.$c").as(c))
    val outR = (payload :+ rightTs)
      .map(c => col(s"${Wc}m.$c").as(s"$prefix$c"))
    matched.select(outL ++ outR: _*)
  }
}
