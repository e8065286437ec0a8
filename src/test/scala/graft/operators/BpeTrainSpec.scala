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

  // in-memory reference trainer: the same algorithm on a driver-side word
  // map — pair counts weighted by word freq (overlapping adjacencies),
  // argmax by (cnt desc, x, y), ONE greedy left-to-right merge pass per
  // round. Used to pin the distributed trainer at round counts large
  // enough to cross many Lineage.cut boundaries.
  private def referenceTrain(words: Map[String, Long],
                             nMerges: Int): Seq[BpeTrain.LearnedMerge] = {
    var tbl = words.map { case (w, f) => w.map(_.toString).toVector -> f }
    val out = Vector.newBuilder[BpeTrain.LearnedMerge]
    var k = 1
    var go = true
    while (k <= nMerges && go) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      tbl.foreach { case (syms, f) =>
        syms.indices.dropRight(1).foreach { i =>
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      if (counts.isEmpty) go = false
      else {
        val ((x, y), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        out += BpeTrain.LearnedMerge(k, x, y, c)
        tbl = tbl.map { case (syms, f) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.size) {
            if (i < syms.size - 1 && syms(i) == x && syms(i + 1) == y) {
              b += (x + y); i += 2
            } else { b += syms(i); i += 1 }
          }
          (b.result(), f)
        }
        k += 1
      }
    }
    out.result()
  }

  test("200+ merge rounds match the in-memory reference (lineage cut law: " +
    "round cost stays bounded across ~25 cut boundaries)") {
    // a synthetic vocabulary rich enough to sustain >200 distinct merges:
    // 400 LCG-generated 12-char words over the full alphabet (a structured
    // generator collapses — an earlier (i*7 + j*j) % 8 attempt produced
    // 400 rotations of ONE base word and exhausted at 40 merges)
    var lcg = 12345L
    def nextChar(): Char = {
      lcg = lcg * 6364136223846793005L + 1442695040888963407L
      ('a' + ((lcg >>> 33) % 26)).toChar
    }
    val words = (0 until 400).map { i =>
      ((0 until 12).map(_ => nextChar()).mkString, (i % 5 + 1).toLong)
    }.toMap
    val docs = words.toSeq.flatMap { case (w, f) =>
      Seq.fill(f.toInt)(w) }.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val got = BpeTrain.train(docs, "text", nMerges = 220, maxWords = 2000)
    val want = referenceTrain(words, 220)
    assert(got === want)
    assert(got.size === 220, s"vocabulary exhausted early at ${got.size}")
    // STRUCTURAL runaway-lineage tripwire (the old wall-clock <120 s bound
    // was flaky on loaded CI hosts for reasons unrelated to the cut): with
    // the every-CutEvery cut the round frame's logical plan is bounded at
    // O(CutEvery) nodes no matter how many rounds ran (post-cut the frame
    // is a LogicalRDD plus <= CutEvery replace projections); without it
    // the plan grows ~1 node per round, so 220 rounds read >= 220 here
    assert(BpeTrain.lastMaxPlanNodes > 0 &&
      BpeTrain.lastMaxPlanNodes <= 8 * BpeTrain.CutEvery,
      s"round-frame plan peaked at ${BpeTrain.lastMaxPlanNodes} logical " +
        "nodes across 220 rounds — lineage cut broken?")
  }

  test("e2e law incl. SELF-PAIR rules: applier(learned table) == greedy " +
    "reference tokenization") {
    // runs of identical letters force the trainer to learn (x, x) rules —
    // the case the single-delimiter SQL replay cannot replay and the
    // applier kernel must still tokenize exactly like the greedy reference
    val words = Map("aaaaaa" -> 5L, "aaab" -> 3L, "bbbb" -> 2L, "ab" -> 4L)
    val docs = words.toSeq.zipWithIndex
      .map { case ((w, f), i) => (i.toLong, (w + " ") * f.toInt) }
      .toDF("doc_id", "text")
    val learned = BpeTrain.train(docs, "text", nMerges = 6)
    assert(learned.exists(m => m.x == m.y), "fixture failed to learn a self-pair")
    val table = new BpeTable(learned.map(m => (m.x, m.y)))
    // reference greedy application of the learned rules to each word
    def refTokens(w: String): Vector[String] = {
      var syms = w.map(_.toString).toVector
      learned.foreach { m =>
        val b = Vector.newBuilder[String]
        var i = 0
        while (i < syms.size) {
          if (i < syms.size - 1 && syms(i) == m.x && syms(i + 1) == m.y) {
            b += (m.x + m.y); i += 2
          } else { b += syms(i); i += 1 }
        }
        syms = b.result()
      }
      syms
    }
    (words.keys ++ Seq("aaaaa", "aaaaaaa", "aabbab", "baaaab")).foreach { w =>
      assert(table.tokenize(w) === refTokens(w), s"word '$w'")
    }
  }

  test("exhaustion: fewer mergeable pairs than requested rounds stops early") {
    val docs = Seq((1L, "ab")).toDF("doc_id", "text")
    val got = BpeTrain.train(docs, "text", nMerges = 10)
    // round 1 merges (a,b); the word is then a single symbol -> no pairs
    assert(got == Seq(BpeTrain.LearnedMerge(1, "a", "b", 1L)))
  }
}
