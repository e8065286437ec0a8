package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** pmiBigrams laws on hand-computed corpora: exact fixed-point scores,
  * min-count gate, deterministic ranking.
  */
class TextMiningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(minCount: Long, k: Int, docs: String*) =
    TextMining.pmiBigrams(docs.zipWithIndex.map(_.swap).toDF("id", "text"),
      "text", minCount, k)
      .select("rnk", "w1", "w2", "c_xy", "c_x", "c_y", "score_fp")
      .as[(Long, String, String, Long, Long, Long, Long)].collect().toSeq

  test("exact fixed-point score on a hand-computed corpus") {
    // corpus: "a b" ×5 and "c c" ×5 → T=20, c_a=c_b=5, c_c=10
    val got = run(5L, 10, Seq.fill(5)("a b") ++ Seq.fill(5)("c c"): _*)
    // (a,b): 5*20*1e6/(5*5) = 4_000_000 ; (c,c): 5*20*1e6/(10*10) = 1_000_000
    assert(got == Seq(
      (1L, "a", "b", 5L, 5L, 5L, 4000000L),
      (2L, "c", "c", 5L, 10L, 10L, 1000000L)))
  }

  test("bigrams under min-count are dropped before ranking") {
    val got = run(5L, 10, Seq.fill(5)("x y") ++ Seq.fill(4)("p q"): _*)
    assert(got.map(r => (r._2, r._3)) == Seq(("x", "y")))
  }

  test("ties rank by (w1, w2) and k caps the output") {
    // four symmetric pairs with identical stats
    val docs = Seq("a b", "c d", "e f", "g h").flatMap(Seq.fill(5)(_))
    val got = run(5L, 3, docs: _*)
    assert(got.map(r => (r._1, r._2, r._3)) ==
      Seq((1L, "a", "b"), (2L, "c", "d"), (3L, "e", "f")))
  }

  test("cross-doc adjacency never counts (bigrams stay within a doc)") {
    // "q" ending one doc and "r" starting the next must not form (q,r)
    val got = run(1L, 50, Seq.fill(3)("w q") ++ Seq.fill(3)("r s"): _*)
    assert(!got.exists(r => r._2 == "q" && r._3 == "r"))
  }
}
