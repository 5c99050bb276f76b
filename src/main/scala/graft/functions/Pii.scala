package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training corpora — emails, IPv4
  * addresses, US-style phone numbers, and 16-digit card numbers found
  * in free text are counted and replaced with typed placeholder tokens
  * (the C4/RefinedWeb-style scrub pass).
  *
  * Pure `Column => Column` regexes over codegen'd built-ins: scan-local,
  * no shuffle, no UDF — the 100 TB cost is one pass over the text
  * column. Patterns deliberately stay within the regex subset that
  * Java's engine and RE2-based engines (DuckDB, Go) interpret
  * identically — `\b`, bounded repetition, non-capturing groups — so an
  * external SQL oracle replays the scrub bit-for-bit; precision/recall
  * tuning beyond that subset (lookarounds etc.) belongs in a dedicated
  * PII model, not the engine pass.
  *
  * Redaction ORDER is part of the semantics: emails first (a phone- or
  * IP-shaped substring INSIDE an address must not split it), then
  * cards, phones, IPs — so a longer pattern is never partially consumed
  * by a shorter one. Counts are computed on the ORIGINAL text.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  /** NNN-NNN-NNNN with word boundaries — the unambiguous US shape. */
  val PhoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
  /** 16 digits in 4-4-4-4 groups. */
  val CardRe = "\\b[0-9]{4}-[0-9]{4}-[0-9]{4}-[0-9]{4}\\b"

  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailRe), lit(0)))
  def ipv4Count(text: Column): Column =
    size(regexp_extract_all(text, lit(Ipv4Re), lit(0)))
  def phoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(PhoneRe), lit(0)))
  def cardCount(text: Column): Column =
    size(regexp_extract_all(text, lit(CardRe), lit(0)))

  /** All four scrubs, in the documented order. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, EmailRe, "<EMAIL>"),
          CardRe, "<CARD>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** Total PII hits: the sum of the four per-category match counts, each
    * computed independently on the ORIGINAL text. Overlapping matches
    * (e.g. a phone- or IP-shaped substring inside an email local part)
    * count once per category, while `redact` replaces that region once —
    * so this count can exceed the number of replacements. */
  def piiCount(text: Column): Column =
    emailCount(text) + ipv4Count(text) + phoneCount(text) + cardCount(text)
}
