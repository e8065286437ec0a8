package graft.operators

import graft.TestSpark
import graft.functions.{Bpe, BpeTable}
import org.scalatest.funsuite.AnyFunSuite

class BpeTrainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("learned merges match the hand-computed BPE rounds") {
    // corpus: "aaab" x2, "ab" x1
    //   round 1 pair counts: (a,a)=4 [two overlapping per aaab], (a,b)=3
    //     -> merge (a,a); aaab becomes [aa, a, b] (greedy leftmost)
    //   round 2: (a,b)=3 [aaab's tail + ab], (aa,a)=2 -> merge (a,b)
    //   round 3: (aa,ab)=2 -> merge, product aaab
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val got = BpeTrain.train(docs, "text", nMerges = 5)
    assert(got == Seq(
      BpeTrain.LearnedMerge(1, "a", "a", 4L),
      BpeTrain.LearnedMerge(2, "a", "b", 3L),
      BpeTrain.LearnedMerge(3, "aa", "ab", 2L)))
  }

  test("count ties break lexicographically on (x, y)") {
    val docs = Seq((1L, "ba ab")).toDF("doc_id", "text")
    val got = BpeTrain.train(docs, "text", nMerges = 1)
    assert(got == Seq(BpeTrain.LearnedMerge(1, "a", "b", 1L)))
  }

  test("word filter: lowercase [a-z]{2,} only, frequency-weighted") {
    // "Ab" lowers to "ab"; "x" (len 1), "a1b" (digit) are excluded
    val docs = Seq((1L, "Ab ab x a1b"), (2L, "ab cd")).toDF("doc_id", "text")
    val got = BpeTrain.train(docs, "text", nMerges = 1)
    assert(got == Seq(BpeTrain.LearnedMerge(1, "a", "b", 3L)))
  }

  test("learned table is valid for the applier and tokenizes the corpus") {
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val merges = BpeTrain.train(docs, "text", nMerges = 5).map(m => (m.x, m.y))
    val table = new BpeTable(merges) // constructor enforces validity
    assert(table.tokenize("aaab") == Seq("aaab"))
    assert(table.tokenize("ab") == Seq("ab"))
    // rank order applies (a,a) first -> [aa, b]; (a,b) then has no match
    assert(table.tokenize("aab") == Seq("aa", "b"))
    val n = docs.select(Bpe.bpeCount($"text", table)).as[Long].head()
    assert(n == 3L) // [aaab] [aaab] [ab]
  }

  test("training is deterministic across repartitionings") {
    val docs = (1 to 60)
      .map(i => (i.toLong, s"spark table stream w${i % 7} w${i % 3}"))
      .toDF("doc_id", "text")
    val a = BpeTrain.train(docs, "text", nMerges = 8)
    val b = BpeTrain.train(docs.repartition(13), "text", nMerges = 8)
    assert(a == b)
    assert(a.size == 8)
    // counts are non-increasing is NOT a BPE invariant, but positivity is
    assert(a.forall(_.cnt > 0))
  }

  test("exhaustion: fewer mergeable pairs than requested rounds stops early") {
    val docs = Seq((1L, "ab")).toDF("doc_id", "text")
    val got = BpeTrain.train(docs, "text", nMerges = 10)
    // round 1 merges (a,b); the word is then a single symbol -> no pairs
    assert(got == Seq(BpeTrain.LearnedMerge(1, "a", "b", 1L)))
  }
}
