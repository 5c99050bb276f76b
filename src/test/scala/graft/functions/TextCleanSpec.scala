package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextCleanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def clean(pages: Seq[String]) =
    pages.toDF("t")
      .select(TextClean.c4Clean($"t").as("c"))
      .select($"c.n_lines", $"c.n_kept", $"c.dropped", $"c.clean_text")
      .as[(Int, Int, Int, Option[String])].collect().toSeq

  test("line rules: terminal punctuation, min words, javascript") {
    val page = Seq(
      "this line ends with a period.",   // kept
      "this one has no terminal punct",  // dropped: no punctuation
      "too short.",                      // dropped: 2 words
      "enable javascript to view this.", // dropped: javascript
      "is it a question?",               // kept
      "he said \"stop\"",                // kept: closing quote is terminal
      "quoted ending works fine \"yes.\"" // kept: ends in quote
    ).mkString("\n")
    val Seq((nl, nk, d, Some(txt))) = clean(Seq(page))
    assert(nl == 7 && nk == 4 && d == 0)
    assert(txt == Seq("this line ends with a period.",
      "is it a question?", "he said \"stop\"",
      "quoted ending works fine \"yes.\"")
      .mkString("\n"))
  }

  test("page blocks: lorem ipsum and braces drop the whole page") {
    val good = "one fine clean line right here.\n" * 5
    val out = clean(Seq(
      good.trim,
      good.trim + "\nsome Lorem Ipsum boilerplate here.",
      good.trim + "\nvar f = function() { return 1; }."))
    assert(out(0)._3 == 0)
    assert(out(1)._3 == 1 && out(1)._4.isEmpty)
    assert(out(2)._3 == 1 && out(2)._4.isEmpty)
  }

  test("pages retaining fewer than minKeptLines are dropped") {
    val page = "only two good lines here sadly.\nsecond good line is here too.\nbad line"
    val Seq((nl, nk, d, txt)) = clean(Seq(page))
    assert(nl == 3 && nk == 2 && d == 1 && txt.isEmpty)
  }

  test("blank page: zero lines, dropped, null text") {
    val Seq((nl, nk, d, txt)) = clean(Seq("  "))
    assert(nl == 0 && nk == 0 && d == 1 && txt.isEmpty)
  }
}
