package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** C4-style line-level document cleaning (Raffel et al. 2020, §2.2 of the
  * T5 paper): drop lines that don't end in terminal punctuation, lines
  * with too few words, and lines mentioning javascript; drop whole pages
  * containing a boilerplate marker ("lorem ipsum") or curly braces (code),
  * or retaining too few clean lines.
  *
  * Everything is a pure `Column => Column` over Catalyst built-ins — the
  * whole cleaner fuses into the scan's whole-stage codegen and runs
  * shuffle-free at any corpus size, which is the only acceptable shape for
  * a per-document filter at 100 TB.
  *
  * The reference engine has no text surface (it is a row replicator —
  * river/sync.go); this is part of the LLM-pipeline extension surface.
  */
object TextClean {

  /** Terminal-punctuation test: trimmed line ends in `.`, `!`, `?` or a
    * closing double quote. */
  def endsTerminal(line: Column): Column =
    trim(line).rlike("[.!?\"]$")

  /** Whitespace word count of a line (0 for blank). */
  def wordCount(line: Column): Column = {
    val t = trim(line)
    when(length(t) === 0, lit(0)).otherwise(size(split(t, "\\s+")))
  }

  /** Per-line keep predicate: terminal punctuation, at least `minWords`
    * words, and no "javascript" mention (case-insensitive). */
  def lineKept(line: Column, minWords: Int = 3): Column =
    endsTerminal(line) && wordCount(line) >= minWords &&
      !contains(lower(line), lit("javascript"))

  /** Lines of a document (newline-split); blank text → empty array. */
  def docLines(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(text, "\n"))

  /** Page-level drop test applied BEFORE line filtering: boilerplate
    * marker or code braces anywhere in the document. */
  def pageBlocked(text: Column): Column =
    contains(lower(text), lit("lorem ipsum")) || contains(text, lit("{"))

  /** The retained lines after C4 line filtering. */
  def keptLines(text: Column, minWords: Int = 3): Column =
    filter(docLines(text), l => lineKept(l, minWords))

  /** Full C4 verdict as a struct:
    * `(n_lines, n_kept, dropped, clean_text)` — `dropped` is 1 when the
    * page is blocked or retains fewer than `minKeptLines` clean lines;
    * `clean_text` is the newline-joined retained lines, null for dropped
    * pages.
    */
  def c4Clean(text: Column, minWords: Int = 3,
      minKeptLines: Int = 3): Column = {
    val kept = keptLines(text, minWords)
    val dropped = pageBlocked(text) || size(kept) < minKeptLines
    struct(
      size(docLines(text)).as("n_lines"),
      size(kept).as("n_kept"),
      dropped.cast("int").as("dropped"),
      when(dropped, lit(null).cast("string"))
        .otherwise(array_join(kept, "\n")).as("clean_text"))
  }
}
