package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** In-engine BPE merge training (Sennrich et al., "Neural machine
  * translation of rare words with subword units", ACL 2016) — the
  * tokenizer-training member of the in-engine-training family
  * ([[QualityClassifier]] trains the filter model, this learns the
  * vocabulary).
  *
  * Distributed shape, built for a 100 TB corpus:
  *
  *   1. ONE corpus scan reduces the text to a WORD-FREQUENCY table
  *      (Zipf-bounded: the distinct-word count grows ~logarithmically
  *      with corpus size, so this frame is millions of rows when the
  *      corpus is billions of documents). Training never touches the
  *      corpus again.
  *   2. Each of the k merge iterations is one map-side-combined
  *      aggregate over that bounded table (adjacent-pair counts
  *      weighted by word frequency — symbol-pair cardinality is
  *      vocab²-bounded like [[LangModel]]'s type table) plus a 1-row
  *      TakeOrdered argmax to the driver. No shuffle ever carries
  *      corpus data.
  *   3. The winning pair is folded back as a LITERAL string rewrite,
  *      so iteration state lives in the word table's `sym` column.
  *
  * Determinism / engine portability (the oracle-gate posture): pair
  * counts are integer sums (order-independent); the argmax tie-break is
  * (count DESC, left ASC, right ASC) over ASCII, identical in any
  * engine's binary collation; and merge APPLICATION is exact because of
  * the symbol encoding — every symbol is wrapped `|sym|` and a word is
  * their concatenation (`banana` → `|b||a||n||a||n||a|`), so replacing
  * the literal `|x||y|` with `|xy|` is the classic leftmost
  * non-overlapping BPE merge with NO shared-boundary artifact (each
  * occurrence owns its delimiters outright: `|a||a||a||a|` →
  * `|aa||aa|`, exactly the greedy fold), and SQL `replace` reproduces
  * it byte for byte. Words are restricted to `^[a-z]+$` so the `|`
  * delimiter cannot occur inside a symbol.
  *
  * The reference engine has no training surface (it is a row
  * replicator — river/sync.go); this is LLM-pipeline extension
  * surface.
  */
object BpeTrainer {

  /** One learned merge: at `iter` (1-based), `left`+`right` → `merged`,
    * chosen with adjacent-pair frequency `pairCount`. */
  case class Merge(iter: Int, left: String, right: String,
      merged: String, pairCount: Long)

  /** Lowercase-alpha word frequencies — the bounded training frame. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** `|`-wrapped initial symbol encoding of a word: one symbol per
    * character. */
  def encodeSyms(word: Column): Column =
    regexp_replace(word, "(.)", "|$1|")

  /** Adjacent symbol pairs of an encoded word, as (x, y) rows weighted
    * by the word count — `sym` strips to a symbol array first. */
  private def pairFrame(words: DataFrame): DataFrame = {
    val arr = split(trim(col("sym"), "|"), "\\|\\|")
    // guard: sequence(1, 0) is DESCENDING in Spark, so single-symbol
    // words must short-circuit to an empty pair list
    val pairs = when(size(col("a")) < 2,
      array().cast("array<struct<x:string,y:string>>"))
      .otherwise(transform(sequence(lit(1), size(col("a")) - 1), i =>
        struct(element_at(col("a"), i).as("x"),
          element_at(col("a"), i + 1).as("y"))))
    words
      .select(col("cnt"), arr.as("a"))
      .select(col("cnt"), explode(pairs).as("p"))
      .groupBy(col("p.x").as("x"), col("p.y").as("y"))
      .agg(sum(col("cnt")).as("pc"))
  }

  /** Learn `iters` merges from the corpus. Runs the iteration loop on
    * the driver: each round is one bounded aggregate + one 1-row
    * argmax + one literal rewrite of the persisted word table. */
  def train(docs: DataFrame, textCol: String, iters: Int): Seq[Merge] = {
    require(iters >= 1 && iters <= 64, s"iters=$iters out of range [1, 64]")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var words = wordCounts(docs, textCol)
      .select(col("cnt"), encodeSyms(col("word")).as("sym"))
      .persist(lvl)
    // previous generation, pinned until the CURRENT one materializes:
    // each round's argmax collect fills `words`' cache (reading the
    // parent's), so the parent releases right after it — no separate
    // count() materialization job per iteration (r15: halves the
    // loop's job count; unpersisting the parent any earlier would
    // re-run the whole replace chain from the root on a cache miss).
    // Scale note: this pins TWO full generations of the word table
    // simultaneously for the life of each round (~2× the old
    // materialize-then-drop peak); MEMORY_AND_DISK spills the excess,
    // so at 100 TB the trade is disk residency for one fewer job per
    // iteration — budget cache accordingly when tuning memory.
    var parent: Option[DataFrame] = None
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    try {
      for (i <- 1 to iters) {
        val top = pairFrame(words)
          .orderBy(col("pc").desc, col("x").asc, col("y").asc)
          .limit(1).collect()
        parent.foreach(_.unpersist(false))
        parent = None
        if (top.nonEmpty) {
          val (x, y, pc) = (top(0).getAs[String]("x"),
            top(0).getAs[String]("y"), top(0).getAs[Long]("pc"))
          out += Merge(i, x, y, x + y, pc)
          val next = words
            .select(col("cnt"),
              replace(col("sym"), lit(s"|$x||$y|"), lit(s"|${x + y}|"))
                .as("sym"))
            .persist(lvl)
          parent = Some(words)
          words = next
        }
      }
    } finally {
      parent.foreach(_.unpersist(false))
      words.unpersist(false)
    }
    out.toSeq
  }

  /** The learned merge table as a DataFrame (iter, left, right, merged,
    * pair_count). */
  def mergesDF(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF("iter", "left", "right", "merged", "pair_count")
  }

  /** Apply learned merges to a word column (in learned order) and
    * return its BPE symbol count — the segmentation the vocabulary
    * buys, as a scan-local Column (the k replaces chain inside
    * codegen; no join, no shuffle). */
  def segmentCount(word: Column, merges: Seq[Merge]): Column = {
    val sym = merges.foldLeft(encodeSyms(word)) { (c, m) =>
      replace(c, lit(s"|${m.left}||${m.right}|"), lit(s"|${m.merged}|"))
    }
    size(split(trim(sym, "|"), "\\|\\|"))
  }
}
