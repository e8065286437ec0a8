package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Deletion-neighborhood fuzzy join vs a brute-force Levenshtein oracle:
  * completeness (every true ≤1 pair found), soundness (nothing else), and
  * the classic distance-2 collision ("ab"/"ba") being filtered.
  */
class RecordLinkageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def run(l: Seq[(Long, String)], r: Seq[(Long, String)]) =
    RecordLinkage.fuzzyJoin(l.toDF("id", "s"), r.toDF("id", "s"), "id", "s")
      .select("left_id", "right_id", "dist")
      .as[(Long, Long, Long)].collect().toSet

  test("finds exactly the planted delete / insert / substitute links") {
    val clean = Seq(1L -> "wombat", 2L -> "ferret", 3L -> "badger")
    val dirty = Seq(
      11L -> "wmbat",   // deletion of 'o'
      12L -> "ferrret", // insertion of 'r'
      13L -> "bodger",  // substitution a→o
      14L -> "unrelated")
    val got = run(dirty, clean)
    assert(got == Set((11L, 1L, 1L), (12L, 2L, 1L), (13L, 3L, 1L)))
  }

  test("identical strings link at distance 0") {
    assert(run(Seq(5L -> "same"), Seq(9L -> "same")) == Set((5L, 9L, 0L)))
  }

  test("distance-2 neighborhood collisions are filtered (ab vs ba)") {
    // 'ab' and 'ba' share deletion keys "a" AND "b" but are distance 2
    assert(run(Seq(1L -> "ab"), Seq(2L -> "ba")).isEmpty)
  }

  test("fuzzySelfJoin equals fuzzyJoin(df, df) filtered to left < right " +
    "(the in-join canonicalization drops no pair and adds none)") {
    val rnd = new scala.util.Random(29)
    val alpha = "abcd"
    def word() = (0 until 3 + rnd.nextInt(3))
      .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val rows = (1L to 80L).map(i => i -> word())
    val df = rows.toDF("id", "s")
    val viaPair = RecordLinkage.fuzzyJoin(df, df, "id", "s")
      .filter(org.apache.spark.sql.functions.col("left_id") <
        org.apache.spark.sql.functions.col("right_id"))
      .select("left_id", "right_id", "dist")
      .as[(Long, Long, Long)].collect().toSet
    val viaSelf = RecordLinkage.fuzzySelfJoin(df, "id", "s")
      .select("left_id", "right_id", "dist")
      .as[(Long, Long, Long)].collect().toSet
    assert(viaSelf == viaPair)
    assert(viaSelf.nonEmpty, "degenerate random corpus — no pairs to check")
    assert(viaSelf.forall { case (a, b, _) => a < b })
  }

  test("matches brute force on a random corpus (completeness + soundness)") {
    val rnd = new scala.util.Random(17)
    val alpha = "abcd"
    def word() = (0 until 3 + rnd.nextInt(3))
      .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val left = (1L to 60L).map(i => i -> word())
    val right = (101L to 160L).map(i => i -> word())
    val expect = (for {
      (li, ls) <- left; (ri, rs) <- right
      d = lev(ls, rs) if d <= 1
    } yield (li, ri, d.toLong)).toSet
    assert(run(left, right) == expect)
    assert(expect.nonEmpty, "degenerate random corpus — no pairs to check")
  }
}
