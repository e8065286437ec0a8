package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the merges-table BPE tokenizer:
  *   - pinned tokenizations/ids for known strings (the fixture contract);
  *   - in-rank-order application == the reference greedy
  *     lowest-rank-first loop, exhaustively over randomized words (the
  *     equivalence the SQL oracle's replay form depends on);
  *   - invalid merges tables are refused loudly;
  *   - the Column expressions agree with the kernel through codegen.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val t = BpeTable.default

  test("pinned tokenizations for known strings") {
    assert(t.tokenize("spark") == Seq("spark"))
    assert(t.tokenize("table") == Seq("table"))
    assert(t.tokenize("stream") == Seq("stream"))
    assert(t.tokenize("batch") == Seq("batch"))
    assert(t.tokenize("window") == Seq("window"))
    assert(t.tokenize("column") == Seq("column"))
    assert(t.tokenize("the") == Seq("the"))
    assert(t.tokenize("join") == Seq("join"))
    assert(t.tokenize("value") == Seq("value"))
    assert(t.tokenize("data") == Seq("data"))
    assert(t.tokenize("customer") == Seq("c", "u", "st", "o", "m", "er"))
    assert(t.tokenize("qqq") == Seq("q", "q", "q")) // no rule applies
    assert(t.tokenize("") == Seq.empty)
  }

  test("pinned token ids: base = codepoint, product r = 0x110000 + r - 1") {
    import org.apache.spark.unsafe.types.UTF8String
    def ids(s: String): Seq[Long] =
      t.tokenIds(UTF8String.fromString(s)).toLongArray().toSeq
    // rule 2 is (th, e) -> "the"
    assert(ids("the") == Seq(0x110000L + 1))
    assert(ids("a") == Seq('a'.toLong))
    // rule 17 is (spar, k) -> "spark"; two words concatenate
    assert(ids("spark the") == Seq(0x110000L + 16, 0x110000L + 1))
    assert(ids("qa") == Seq('q'.toLong, 'a'.toLong))
  }

  test("counts: whitespace words, blank text is zero") {
    import org.apache.spark.unsafe.types.UTF8String
    def c(s: String): Long = t.count(UTF8String.fromString(s))
    assert(c("") == 0L)
    assert(c("   ") == 0L)
    assert(c("spark table") == 2L)
    assert(c("  spark   customer ") == 1L + 6L)
  }

  /** Reference implementation: the GPT-2-style greedy loop — repeatedly
    * find the LOWEST-RANK pair present anywhere and merge all its
    * left-to-right non-overlapping occurrences.
    */
  private def greedy(word: String): Seq[String] = {
    val rank = t.merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    var sym: Vector[String] = word.map(_.toString).toVector
    var done = false
    while (!done && sym.size > 1) {
      val present = sym.zip(sym.tail).flatMap(p => rank.get(p))
      if (present.isEmpty) done = true
      else {
        val (x, y) = t.merges(present.min)
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < sym.size) {
          if (i < sym.size - 1 && sym(i) == x && sym(i + 1) == y) {
            out += x + y; i += 2
          } else { out += sym(i); i += 1 }
        }
        sym = out.result()
      }
    }
    sym
  }

  test("in-rank-order application == greedy lowest-rank-first (randomized)") {
    val alphabet = "abcdehijklmnoprstuvwy "
    val rnd = new scala.util.Random(20260814L)
    (1 to 500).foreach { _ =>
      val w = (1 to (1 + rnd.nextInt(31)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString.trim
      if (w.nonEmpty && !w.contains(' '))
        assert(t.tokenize(w) == greedy(w), s"word '$w'")
    }
    // adversarial same-symbol runs (the oracle's 5-pass replace bound)
    Seq("tttttttt", "t" * 31, "ththththththth", "erererererer").foreach { w =>
      assert(t.tokenize(w) == greedy(w), s"word '$w'")
    }
  }

  test("invalid merges tables are refused") {
    intercept[IllegalArgumentException] {
      new BpeTable(Seq("ab" -> "c")) // 'ab' is no rule's product
    }
    intercept[IllegalArgumentException] {
      // duplicate product string 'abc' via two different splits
      new BpeTable(Seq("a" -> "b", "b" -> "c", "ab" -> "c", "a" -> "bc"))
    }
    intercept[IllegalArgumentException] { new BpeTable(Seq.empty) }
  }

  test("Column expressions match the kernel through codegen") {
    import spark.implicits._
    import org.apache.spark.unsafe.types.UTF8String
    val texts = Seq("spark table stream", "the customer window", "", "qqq a")
    val df = texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "text")
    val got = df.select(col("id"), Bpe.bpeCount(col("text")).as("n"),
        Bpe.bpeIds(col("text")).as("ids"))
      .orderBy("id").collect()
    texts.zipWithIndex.foreach { case (s, i) =>
      assert(got(i).getLong(1) == t.count(UTF8String.fromString(s)))
      assert(got(i).getSeq[Long](2) ==
        t.tokenIds(UTF8String.fromString(s)).toLongArray().toSeq)
    }
  }
}
