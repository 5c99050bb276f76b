package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  test("tokens: blank text yields empty array, not ['']") {
    val out = Seq("", "  ", "a b  c").toDF("t")
      .select(TextFunctions.tokenCount($"t").as("n")).as[Int].collect()
    assert(out.toSeq == Seq(0, 0, 3))
  }

  test("bpeTokenCount splits alpha/digit/punct runs") {
    val out = Seq("hello world42!", "a,b").toDF("t")
      .select(TextFunctions.bpeTokenCount($"t").as("n")).as[Int].collect()
    // hello | world | 42 | !  and  a | , | b
    assert(out.toSeq == Seq(4, 3))
  }

  test("shingles: fewer tokens than n -> empty; distinct; ordered join") {
    val out = Seq("a b", "a b c d", "a b a b a b").toDF("t")
      .select(TextFunctions.shingles($"t", 3).as("s"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq.empty)
    assert(out(1) == Seq("a b c", "b c d"))
    assert(out(2) == Seq("a b a", "b a b")) // distinct keeps first
  }

  test("fingerprint is whitespace/case-normalized") {
    val fps = Seq("Hello  World", "hello world", "helloworld").toDF("t")
      .select(TextFunctions.fingerprint($"t")).as[String].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("rollingHash matches a reference computation") {
    def ref(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    val inputs = Seq("hello", "spark engine", "")
    val got = inputs.toDF("t")
      .select(TextFunctions.rollingHash($"t")).as[Long].collect()
    assert(got.toSeq == inputs.map(ref))
  }

  test("quality signals are bounded in [0,1] on real docs") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val bad = docs.select(
      TextFunctions.stopwordRatio($"text").as("a"),
      TextFunctions.uniqueTokenRatio($"text").as("b"),
      TextFunctions.alphaRatio($"text").as("c"),
      TextFunctions.qualityScore($"text").as("d"))
      .filter(!($"a".between(0, 1) && $"b".between(0, 1) &&
        $"c".between(0, 1) && $"d".between(0, 1)))
    assert(bad.count() == 0)
  }

  test("langId: stopword-bearing text -> en, salad -> und") {
    val out = Seq("the cat sat on the mat", "foo bar baz qux quux")
      .toDF("t").select(TextFunctions.langId($"t")).as[String].collect()
    assert(out.toSeq == Seq("en", "und"))
  }

  test("langIdNgram: trigram profiles separate en/fr/de/es; noise -> und") {
    val samples = Seq(
      ("the cat sat on the mat and the dog went to the house " +
        "with the other animals", "en"),
      ("le chat est dans la maison et les enfants vont dans le " +
        "jardin pour jouer", "fr"),
      ("der hund und die katze sind in dem haus und die kinder " +
        "spielen in dem garten", "de"),
      ("el perro y el gato de la casa van con los amigos para " +
        "jugar en el parque", "es"),
      ("zzz qqq xxx kkk zzz qqq xxx kkk zzz qqq", "und"),
      ("", "und"))
    val out = samples.map(_._1).toDF("t")
      .select(TextFunctions.langIdNgram($"t")).as[String].collect()
    assert(out.toSeq == samples.map(_._2),
      out.zip(samples.map(_._2)).mkString(", "))
  }
}
