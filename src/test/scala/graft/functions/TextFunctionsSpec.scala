package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tokens: whitespace split, trim, empty-safe") {
    val out = Seq("  a  b\tc ", "", "   ", "single")
      .toDF("t").select(TextFunctions.nTokens(col("t")).as("n"))
      .as[Int].collect().toSeq
    assert(out == Seq(3, 0, 0, 1))
  }

  test("fingerprint is order- and duplicate-insensitive") {
    val fps = Seq("the quick fox", "fox the quick", "fox fox the quick", "the quick ox")
      .toDF("t").select(TextFunctions.fingerprint(col("t")).as("f"))
      .as[String].collect().toSeq
    assert(fps(0) == fps(1))
    assert(fps(0) == fps(2))
    assert(fps(0) != fps(3))
  }

  test("langId picks dominant stopword language, und when none") {
    val out = Seq(
      "the cat and the dog is in a house",
      "el gato y la casa de los es",
      "der hund und die katze ist von zu",
      "xyzzy qwerty foo")
      .toDF("t").select(TextFunctions.langId(col("t")).as("l"))
      .as[String].collect().toSeq
    assert(out == Seq("en", "es", "de", "und"))
  }

  test("bpe token counting splits words and punctuation") {
    val out = Seq("hello, world! a.b", "no punct here")
      .toDF("t").select(TextFunctions.bpeTokens(col("t")).as("n"))
      .as[Int].collect().toSeq
    // hello , world ! a . b = 7 ; no punct here = 3
    assert(out == Seq(7, 3))
  }

  test("quality signals: alpha ratio and mean token length") {
    val row = Seq("ab cd!").toDF("t").select(
      TextFunctions.alphaRatio(col("t")).as("a"),
      TextFunctions.meanTokenLen(col("t")).as("m"))
      .as[(Double, Double)].head()
    assert(math.abs(row._1 - 4.0 / 6.0) < 1e-12)
    assert(math.abs(row._2 - 5.0 / 2.0) < 1e-12) // "ab"+"cd!" = 5 chars / 2 tokens
  }

  test("chunks: coverage, overlap, and short-doc single chunk") {
    val doc = (1 to 40).map(i => s"w$i").mkString(" ")
    val rows = Seq((1L, doc), (2L, "a b c"))
      .toDF("id", "t")
      .select(col("id"), explode(TextFunctions.chunks(col("t"), 32, 24)).as("c"))
      .select(col("id"), col("c.chunk_no"), col("c.chunk"), col("c.n_tokens"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    val d1 = rows.filter(_._1 == 1L).sortBy(_._2)
    // 40 tokens, size 32, stride 24 -> chunks at 0 (32 toks) and 24 (16 toks)
    assert(d1.map(_._2).toSeq == Seq(0, 1))
    assert(d1.map(_._4).toSeq == Seq(32, 16))
    assert(d1(0)._3.startsWith("w1 ") && d1(0)._3.endsWith(" w32"))
    assert(d1(1)._3.startsWith("w25 ") && d1(1)._3.endsWith(" w40"))
    // every token appears in at least one chunk; overlap = size - stride
    val covered = d1.flatMap(_._3.split(" ")).toSet
    assert(covered == (1 to 40).map(i => s"w$i").toSet)
    // short doc: exactly one chunk with all tokens
    val d2 = rows.filter(_._1 == 2L)
    assert(d2.length == 1 && d2.head._4 == 3 && d2.head._3 == "a b c")
  }

  test("redact replaces all matches in rule order; countMatches counts them") {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "[0-9]{3}-[0-9]{4,}"
    val rows = Seq(
      "mail a@b.com and c.d@e.org or 555-1234 x",
      "no pii here",
      "777-88889 only")
      .toDF("t")
      .select(
        TextFunctions.redact(col("t"), Seq(email -> "<EMAIL>", phone -> "<PHONE>")).as("r"),
        TextFunctions.countMatches(col("t"), email).as("ne"),
        TextFunctions.countMatches(col("t"), phone).as("np"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    assert(rows(0) == ("mail <EMAIL> and <EMAIL> or <PHONE> x", 2, 1))
    assert(rows(1) == ("no pii here", 0, 0))
    assert(rows(2) == ("<PHONE> only", 0, 1))
  }

  test("normalize_text: NFC composition, casefold, whitespace collapse") {
    val inputs = Seq(
      "  Hello   WORLD  ",          // collapse + lower + trim
      "Cafe\u0301 du  Monde",       // decomposed e + accent -> NFC single char
      "")                           // empty stays empty
    val out = inputs.toDF("t")
      .select(graft.functions.TextExpressions.normalizeText(col("t")).as("n"))
      .as[String].collect().toSeq
    assert(out(0) == "hello world")
    assert(out(1) == "caf\u00e9 du monde")
    assert(out(1).length == 13) // composed form: one char for e-acute
    assert(out(2) == "")
  }
}
