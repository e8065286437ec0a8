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
