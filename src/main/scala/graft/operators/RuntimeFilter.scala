package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom runtime filter for selective joins — the "small side prunes
  * the big scan" move.
  *
  * A shuffle join on 100 TB pays for every probe-side row whether or
  * not it survives the join. When the build side is selective (a
  * filtered dimension), a Bloom filter of its join keys applied at the
  * probe SCAN drops non-matching rows before they are ever shuffled —
  * Spark's own InjectRuntimeFilter does this opportunistically; this
  * operator makes it explicit, predictable, and available to
  * compositions the optimizer won't see through (e.g. after custom
  * staging). False positives pass the bloom and die in the real join,
  * so the result is EXACTLY the plain join's; false negatives are
  * impossible (every build key's bits are set).
  *
  * Shape: the mask is built with one aggregation over the build side
  * (distinct probe positions — bounded by `mBits` regardless of build
  * cardinality) and baked into the probe projection as a broadcast
  * array literal: k bit-probes per row, no join, no shuffle added.
  * Size `mBits` ≈ 10–16 bits per expected build key for a ≤1% false
  * positive rate. */
object RuntimeFilter {

  /** Membership predicate over a bloom of `build`'s `keyCol` (int64)
    * values: `col => Boolean` suitable for `probe.filter(...)`.
    * Hashing is xxhash64 — portability doesn't matter here because the
    * downstream join removes false positives; only zero false
    * negatives is semantic, and that holds by construction. */
  def keyBloom(build: DataFrame, keyCol: String, mBits: Int,
      k: Int = 4): Column => Column = {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
      s"mBits=$mBits must be a power of two >= 64 (the mask is " +
        "stored in 64-bit words; smaller sizes allocate zero words)")
    require(k >= 1, s"bloom k=$k must be >= 1")
    val h = pmod(xxhash64(col(keyCol)), lit(1L << 60))
    val positions = build
      .select(explode(array((0 until k).map(j =>
        Decontam.bloomPos(h, j, mBits)): _*)).as("pos"))
      .distinct()
      .collect().map(_.getLong(0))
    val words = new Array[Long](mBits / 64)
    positions.foreach(p => words((p >> 6).toInt) |= (1L << (p & 63)))
    val mask = typedLit(words.toSeq)
    def bitSet(pos: Column) =
      call_function("shiftright",
        element_at(mask, (shiftright(pos, 6) + lit(1L)).cast("int")),
        pmod(pos, lit(64L)).cast("int")).bitwiseAND(lit(1L)) === lit(1L)
    key => {
      val kh = pmod(xxhash64(key), lit(1L << 60))
      (0 until k).map(j => bitSet(Decontam.bloomPos(kh, j, mBits)))
        .reduce(_ && _)
    }
  }

  /** The prefiltered join: probe rows failing the build-key bloom are
    * dropped at the probe scan, before the join's exchange; the join
    * itself then yields exactly `probe ⋈ build`. Use when `build` is
    * selective and `probe` is the big table. */
  def bloomJoin(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, mBits: Int, k: Int = 4): DataFrame = {
    val bloom = keyBloom(build, buildKey, mBits, k)
    probe.filter(bloom(col(probeKey)))
      .join(build, col(probeKey) === build(buildKey))
  }
}
