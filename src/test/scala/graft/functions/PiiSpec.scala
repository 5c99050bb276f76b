package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** PII count + redact: per-category counts on hand-built texts, the
  * documented replacement order (emails first, so an address is never
  * split by the phone/IP patterns inside it), and the documented
  * overlap semantics (counts are independent per category and may
  * exceed redact's replacement count). */
class PiiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def run(texts: String*): Seq[(Int, Int, Int, Int, String)] =
    texts.toDF("text").select(
      Pii.emailCount(col("text")).as("e"),
      Pii.phoneCount(col("text")).as("p"),
      Pii.ipv4Count(col("text")).as("i"),
      Pii.cardCount(col("text")).as("c"),
      Pii.redact(col("text")).as("r"))
      .as[(Int, Int, Int, Int, String)].collect().toSeq

  test("counts and redaction on plain cases") {
    val Seq((e, p, i, c, r)) = run(
      "mail a@b.co or c.d+x@e.org, call 555-123-4567, " +
        "host 10.0.0.1, card 1111-2222-3333-4444")
    assert((e, p, i, c) == ((2, 1, 1, 1)))
    assert(r == "mail <EMAIL> or <EMAIL>, call <PHONE>, " +
      "host <IP>, card <CARD>")
  }

  test("email wins over inner phone/IP shapes (replacement order)") {
    // local part IS a phone-shaped substring; domain is IP-like
    val Seq((e, p, i, _, r)) = run("reach 555-123-4567@10.0.0.99.com now")
    assert(e == 1)
    // counts are per-category on the ORIGINAL text: the phone and IP
    // shapes inside the address still count (documented overlap)
    assert(p == 1 && i == 1)
    // but redaction replaces the whole address once — email first
    assert(r == "reach <EMAIL> now")
  }

  test("clean text is untouched; boundaries respected") {
    val Seq((e, p, i, c, r)) =
      run("no pii here: 123-45 and 1.2.3 and a@b only")
    assert((e, p, i, c) == ((0, 0, 0, 0)))
    assert(r == "no pii here: 123-45 and 1.2.3 and a@b only")
    // 17-digit run is not a 16-digit card (word boundaries)
    val Seq((_, _, _, c2, _)) = run("11111-2222-3333-4444")
    assert(c2 == 0)
  }
}
