package graft.operators

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  private lazy val corpus = {
    val rnd = new scala.util.Random(11)
    val langs = Seq("en", "de", "fr")
    (1 to 90).map { id =>
      val lang = langs(id % langs.size)
      val nTok = 1 + rnd.nextInt(40)
      (id.toLong, lang, (1 to nTok).map(i => s"w${rnd.nextInt(30)}").mkString(" "))
    }
  }

  test("stratifiedSample equals the window row_number reference") {
    val df = corpus.toDF("doc_id", "lang", "text")
    val got = CorpusOps.stratifiedSample(df, "lang", "doc_id", 7)
      .as[(String, Long, Long)].collect().toSet
    val want = corpus
      .map { case (id, lang, _) => (lang, md5Hex(id.toString), id) }
      .groupBy(_._1)
      .flatMap { case (lang, rows) =>
        rows.sortBy(r => (r._2, r._3)).take(7).zipWithIndex
          .map { case (r, i) => (lang, r._3, i + 1L) }
      }.toSet
    assert(got == want)
    // never more than k per stratum
    assert(got.groupBy(_._1).values.forall(_.size <= 7))
  }

  test("mixByTokenBudget admits a hash-prefix reaching the quota") {
    val df = corpus.toDF("doc_id", "lang", "text")
    val quota = 100L
    val got = CorpusOps.mixByTokenBudget(df, "lang", "doc_id", "text", quota)
      .as[(String, Long, Long, Long)].collect()
    val byLang = got.groupBy(_._1)
    byLang.foreach { case (lang, rows) =>
      val sorted = rows.sortBy(_._4)
      // cum_before is the exclusive prefix sum in hash order
      sorted.foldLeft(0L) { case (acc, (_, _, n, cb)) =>
        assert(cb == acc); acc + n
      }
      // every admitted doc starts under quota; total reaches quota unless
      // the stratum ran out of documents
      assert(sorted.forall(_._4 < quota))
      val total = sorted.map(_._3).sum
      val stratumTotal = corpus.filter(_._2 == lang)
        .map(_._3.split("\\s+").length.toLong).sum
      assert(total >= math.min(quota, stratumTotal))
    }
    // determinism
    val again = CorpusOps.mixByTokenBudget(df, "lang", "doc_id", "text", quota)
      .as[(String, Long, Long, Long)].collect()
    assert(got.toSet == again.toSet)
  }

  test("decontaminate flags exactly the docs sharing an n-gram with eval") {
    val docs = Seq(
      (1L, "a b c d e f"),   // eval
      (2L, "x a b c d e f"), // shares grams "a b c" ... with doc 1
      (3L, "p q r s t u"),   // clean
      (4L, "c d e"),         // short doc: full-gram fallback hits "c d e"
      (5L, "a b c d e f")    // identical to eval doc
    ).toDF("doc_id", "text")
    val got = CorpusOps.decontaminate(docs, col("doc_id") === 1, "doc_id", "text", 3)
      .as[(Long, Long)].collect().toMap
    // doc 2: shares the 4 trigrams of doc 1; doc 5: all 4; doc 4: its single
    // full-gram equals eval trigram "c d e"; doc 3: clean (absent)
    assert(got == Map(2L -> 4L, 4L -> 1L, 5L -> 4L))
  }

  test("decontaminateBloom equals decontaminate (one-sided bloom error law)") {
    val docs = corpus.toDF("doc_id", "lang", "text").drop("lang")
    val evalPred = col("doc_id") % 7 === 0
    val exact = CorpusOps.decontaminate(docs, evalPred, "doc_id", "text", 3)
      .as[(Long, Long)].collect().toMap
    // auto-counted sizing AND a deliberately undersized hint (a too-small
    // bloom raises fpp — MORE survivors into the verify join — but can
    // never lose a true hit, so the result must still be exact)
    for (hint <- Seq(-1L, 2L)) {
      val got = CorpusOps.decontaminateBloom(
          docs, evalPred, "doc_id", "text", 3, expectedEvalGrams = hint)
        .as[(Long, Long)].collect().toMap
      assert(got == exact, s"hint=$hint")
    }
    assert(exact.nonEmpty) // the law is vacuous on an empty answer
  }

  test("decontaminateBloom: empty eval slice yields the empty answer") {
    val docs = corpus.toDF("doc_id", "lang", "text").drop("lang")
    val got = CorpusOps.decontaminateBloom(
      docs, col("doc_id") < 0, "doc_id", "text", 3)
    assert(got.columns.toSeq == Seq("doc_id", "n_shared"))
    assert(got.count() == 0L)
  }

  test("packSequences: greedy invariants and sequential-reference equality") {
    val df = corpus.toDF("doc_id", "lang", "text")
    val budget = 64L
    val got = CorpusOps.packSequences(df, "lang", "doc_id", "text", budget)
      .as[(String, Long, Long, Long)].collect()
    got.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      // reference: sequential greedy walk
      var bin = 0L; var fill = 0L
      sorted.foreach { case (_, _, toks, binId) =>
        if (fill > 0 && fill + toks > budget) { bin += 1; fill = 0 }
        fill += toks
        assert(binId == bin)
      }
      // bins over budget only when a single doc exceeds it
      rows.groupBy(_._4).values.foreach { binRows =>
        val total = binRows.map(_._3).sum
        assert(total <= budget || binRows.size == 1)
      }
      // bin ids dense from 0
      val ids = rows.map(_._4).distinct.sorted
      assert(ids.toSeq == (0L until ids.size))
    }
  }

  test("repetitionStats computes Gopher repetition fractions exactly") {
    val docs = Seq(
      // 4 lines, "spam spam" repeated 3x: dup_line_frac = 2/4;
      // chars: line len 9, dup chars 2*9=18 of total 9*3+4=31;
      // 2-grams: "spam spam" x3 within lines... grams are over the WHOLE
      // text (newline is whitespace to the tokenizer): tokens =
      // [spam,spam,spam,spam,spam,spam,rare] -> 6 grams, top "spam spam" x5
      (1L, "spam spam\nspam spam\nspam spam\nrare"),
      // no repetition at all: fracs 0, top gram 1 of 3
      (2L, "alpha beta\ngamma delta")
    ).toDF("doc_id", "text")
    val got = CorpusOps.repetitionStats(docs, "doc_id", "text")
      .as[(Long, Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 4L, 2.0 / 4, 18.0 / 31, 5.0 / 6)))
    assert(got(1) == ((2L, 2L, 0.0, 0.0, 1.0 / 3)))
  }

  test("null ids fail fast with the operator's name; null text packs as 0 tokens") {
    def msgChain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgChain(x.getCause))
    val badIds = Seq(("en", "x", "some text")).toDF("lang", "doc_id", "text")
    val e1 = intercept[Exception] {
      CorpusOps.stratifiedSample(badIds, "lang", "doc_id", 5).collect()
    }
    assert(msgChain(e1).exists(_.contains("stratifiedSample")), s"got $e1")
    val e2 = intercept[Exception] {
      CorpusOps.packSequences(badIds, "lang", "doc_id", "text", 10).collect()
    }
    assert(msgChain(e2).exists(_.contains("packSequences")), s"got $e2")

    // null text = 0 tokens, not an encoder crash / quota-free ride
    val nullText = Seq(("en", 1L, "a b c"), ("en", 2L, null))
      .toDF("lang", "doc_id", "text")
    val packed = CorpusOps.packSequences(nullText, "lang", "doc_id", "text", 10)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    assert(packed == Map(1L -> 3L, 2L -> 0L))
    val mixed = CorpusOps.mixByTokenBudget(nullText, "lang", "doc_id", "text", 100L)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    assert(mixed == Map(1L -> 3L, 2L -> 0L))
  }

  test("repetitionStats keeps null-text docs (no silent drop)") {
    val docs = Seq((1L, "a b"), (2L, null)).toDF("doc_id", "text")
    val got = CorpusOps.repetitionStats(docs, "doc_id", "text")
      .as[(Long, Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(got.length == 2, "null-text doc must survive")
    assert(got(1) == ((2L, 1L, 0.0, 0.0, 1.0))) // one empty line, one "" gram
  }

  /** Sequential reference of the quantized-DSIR score: same md5 bucket hash,
    * same blen quantization, computed doc-by-doc on the driver.
    */
  private def importanceReference(raw: Seq[(Long, String)],
      target: Seq[(Long, String)], buckets: Int): Map[Long, (Long, Long)] = {
    def grams(text: String): Seq[String] = {
      val t = text.trim
      if (t.isEmpty) Seq.empty
      else {
        val w = t.split("\\s+").toSeq
        w ++ w.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      }
    }
    def bucket(g: String): Long =
      java.lang.Long.parseLong(md5Hex(g).take(15), 16) % buckets
    def blen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    def counts(docs: Seq[(Long, String)]): Map[Long, Long] =
      docs.flatMap(d => grams(d._2)).groupBy(bucket).map { case (b, gs) =>
        b -> gs.size.toLong }
    val rc = counts(raw); val tc = counts(target)
    val off = blen(rc.values.sum + buckets) - blen(tc.values.sum + buckets)
    raw.map { case (id, text) =>
      val gs = grams(text)
      val s = gs.map { g =>
        val b = bucket(g)
        blen(tc.getOrElse(b, 0L) + 1) - blen(rc.getOrElse(b, 0L) + 1)
      }.sum
      id -> (gs.size.toLong, s + gs.size * off)
    }.toMap
  }

  test("sourceOverlapMatrix: clones hit jaccard 1, disjoint sources emit no row, cap drops universal grams") {
    // srcA and srcB carry the SAME two docs (clone sources); srcC is
    // token-disjoint; srcD shares one doc's text with srcA/srcB
    val docs = Seq(
      (1L, "srcA", "a b c d e f g h"), (2L, "srcA", "p q r s t u v w"),
      (3L, "srcB", "a b c d e f g h"), (4L, "srcB", "p q r s t u v w"),
      (5L, "srcC", "x1 x2 x3 x4 x5 x6 x7 x8"),
      (6L, "srcD", "a b c d e f g h")
    ).toDF("doc_id", "source", "text")
    val m = CorpusOps.sourceOverlapMatrix(docs, "source", "text", 3, 4)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // clone pair: identical fingerprint sets → jaccard exactly 1
    val (shAB, faAB, fbAB, jAB) = m(("srcA", "srcB"))
    assert(faAB == fbAB && shAB == faAB && jAB == 1.0, s"clone pair got $m")
    // srcC shares nothing with anyone → no row at all
    assert(!m.keys.exists { case (a, b) => a == "srcC" || b == "srcC" })
    // srcD ⊂ srcA: containment-shaped overlap, 0 < jaccard < 1
    val (shAD, faAD, fbAD, jAD) = m(("srcA", "srcD"))
    assert(shAD == fbAD && faAD > fbAD && jAD > 0 && jAD < 1)
    // maxSrcDf=2 drops the fingerprints carried by srcA+srcB+srcD (df=3):
    // the A–D and B–D pairs vanish, the clone pair survives on its
    // "p q r …" half
    val capped = CorpusOps.sourceOverlapMatrix(docs, "source", "text", 3, 4,
        maxSrcDf = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(capped == Set(("srcA", "srcB")), s"capped got $capped")
  }

  test("ngramLmBits equals a sequential reference; in-domain docs score fewer bits") {
    // train slice = lang 'en' (docs 1-3); doc 4 reuses the train vocabulary,
    // doc 5 is fully OOV, doc 6 is sub-bigram, doc 7 empty
    val docs = Seq(
      (1L, "en", "the cat sat on the mat"),
      (2L, "en", "the cat ran to the mat"),
      (3L, "en", "a dog sat on a mat"),
      (4L, "xx", "the cat sat on the mat"),
      (5L, "xx", "zz1 zz2 zz3 zz4 zz5 zz6"),
      (6L, "xx", "one"),
      (7L, "xx", "   ")
    ).toDF("doc_id", "lang", "text")
    val minCount = 2L
    val got = CorpusOps.ngramLmBits(docs, col("lang") === "en",
        "doc_id", "text", minCount)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))).toMap

    // sequential reference over the same definition
    def grams(t: String): Seq[(String, String)] = {
      val w = t.trim.split("\\s+").filter(_.nonEmpty).toSeq
      if (w.size < 2) Seq.empty else w.zip(w.tail)
    }
    val train = Seq("the cat sat on the mat", "the cat ran to the mat",
      "a dog sat on a mat").flatMap(grams)
    val bcAll = train.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cc = train.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val v = train.map(_._2).distinct.size.toLong
    val bc = bcAll.filter(_._2 >= minCount)
    def blen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    def bits(g: (String, String)): Long =
      blen(cc.getOrElse(g._1, 0L) + v) - blen(bc.getOrElse(g, 0L) + 1L)
    docs.collect().foreach { r =>
      val id = r.getLong(0)
      val gs = grams(r.getString(2))
      val (n, tot, bpg) = got(id)
      assert(n == gs.size, s"doc $id n_grams")
      assert(tot == gs.map(bits).sum, s"doc $id total_bits")
      if (gs.isEmpty) assert(bpg.isNaN, s"doc $id bits_per_gram should be null")
      else assert(bpg == tot.toDouble / n, s"doc $id bits_per_gram")
    }
    // domain separation: the in-vocabulary doc scores strictly fewer
    // bits-per-gram than the fully-OOV doc
    assert(got(4L)._3 < got(5L)._3)
    // sub-bigram and blank docs emit the (0, 0, null) row, not no row
    Seq(6L, 7L).foreach { id =>
      val (n, tot, bpg) = got(id)
      assert(n == 0L && tot == 0L && bpg.isNaN, s"doc $id empty row")
    }
  }

  test("ngramLmBits minCount pruning only coarsens: pruned pairs fall to the unseen path") {
    val docs = Seq(
      (1L, "en", "a b a b a c"),   // bc(a,b)=2, bc(b,a)=2, bc(a,c)=1
      (2L, "xx", "a c")
    ).toDF("doc_id", "lang", "text")
    def run(mc: Long): Long =
      CorpusOps.ngramLmBits(docs, col("lang") === "en", "doc_id", "text", mc)
        .filter(col("doc_id") === 2L).head.getLong(2)
    // with minCount=1 the (a,c) pair is in the LM: bits = blen(cc(a)+V)-blen(2)
    // with minCount=2 it is pruned: bits = blen(cc(a)+V)-blen(1) — one more bit
    assert(run(2L) == run(1L) + 1L)
  }

  test("hashSplit: deterministic, exhaustive, stratification-free, growth-stable") {
    val docs = (1L to 2000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val split = CorpusOps.hashSplit(docs, "doc_id", "s1", valPct = 10, testPct = 10)
    val counts = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000L)
    // md5 is uniform: 10/10/80 within a loose tolerance
    assert(counts("val") > 120 && counts("val") < 280, counts)
    assert(counts("test") > 120 && counts("test") < 280, counts)
    assert(counts("train") > 1450 && counts("train") < 1750, counts)
    // growth stability: adding docs never reassigns existing ones
    val grown = CorpusOps.hashSplit(
        (1L to 4000L).map(i => (i, s"doc $i")).toDF("doc_id", "text"),
        "doc_id", "s1", valPct = 10, testPct = 10)
      .filter(col("doc_id") <= 2000L)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val orig = split.select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(grown == orig)
    // a different salt is a genuinely fresh draw
    val resalted = CorpusOps.hashSplit(docs, "doc_id", "s2", 10, 10)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(resalted != orig)
  }

  test("importanceWeights equals the sequential reference; target docs rank higher") {
    // two sharply separated vocabularies: target-domain docs reuse the
    // "fr"-labeled vocab, so their grams carry positive quantized LLR
    val raw = corpus.map { case (id, _, text) => (id, text) }
    val target = corpus.collect { case (id, "fr", text) => (id, text) }
    val got = CorpusOps.importanceWeights(
        corpus.toDF("doc_id", "lang", "text"),
        corpus.toDF("doc_id", "lang", "text").filter($"lang" === "fr"),
        "doc_id", "text", 512)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == importanceReference(raw, target, 512))
  }

  test("importanceWeights separates domains and keeps gram-free docs at 0") {
    val target = Seq((100L, "alpha beta gamma alpha beta"),
      (101L, "beta gamma delta alpha"))
    val raw = target ++ Seq(
      (1L, "alpha beta gamma delta alpha beta"), // target-like
      (2L, "zig zag zog zug zig zag zog"), // off-domain
      (3L, "   ")) // no grams at all
    val out = CorpusOps.importanceWeights(raw.toDF("doc_id", "text"),
        target.toDF("doc_id", "text"), "doc_id", "text", 512)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(3L) == ((3L, 0L, 0L)), "blank doc: zero grams, zero score")
    // per-gram normalized comparison (doc 1 and 2 have different n_grams)
    def perGram(id: Long): Double = out(id)._3.toDouble / out(id)._2
    assert(perGram(1L) > perGram(2L),
      s"target-like doc must outscore off-domain: $out")
    assert(out == importanceReference(raw, target, 512).map { case (k, v) =>
      k -> ((k, v._1, v._2)) }, "sequential reference equality")
  }

  test("importanceWeights xxhash64 production family separates domains too") {
    val target = Seq((100L, "alpha beta gamma alpha beta"),
      (101L, "beta gamma delta alpha"))
    val raw = target ++ Seq(
      (1L, "alpha beta gamma delta alpha beta"),
      (2L, "zig zag zog zug zig zag zog"),
      (3L, "   "))
    val out = CorpusOps.importanceWeights(raw.toDF("doc_id", "text"),
        target.toDF("doc_id", "text"), "doc_id", "text", 512,
        md5Family = false)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(3L) == ((3L, 0L, 0L)))
    def perGram(id: Long): Double = out(id)._3.toDouble / out(id)._2
    assert(perGram(1L) > perGram(2L),
      s"xxhash family must preserve the domain separation: $out")
  }

  test("domainCap equals the one-window reference for every bucket count") {
    val rnd = new scala.util.Random(7)
    // skewed: one hot source with 60% of docs, plus score ties to exercise
    // the doc_id tiebreak across phase boundaries
    val docs = (1 to 200).map { id =>
      val src = if (id <= 120) "hot.com" else s"site${id % 7}.org"
      (id.toLong, src, (rnd.nextInt(12) * 10).toLong)
    }.toDF("doc_id", "source", "score")
    val want = docs.withColumn("rank", row_number().over(
        Window.partitionBy($"source").orderBy($"score".desc, $"doc_id")))
      .filter($"rank" <= 9).select($"source", $"doc_id", $"score", $"rank".cast("long"))
      .as[(String, Long, Long, Long)].collect().toSet
    for (buckets <- Seq(1, 4, 64)) {
      val got = CorpusOps.domainCap(docs, "source", "doc_id", "score",
          cap = 9, buckets = buckets)
        .as[(String, Long, Long, Long)].collect().toSet
      assert(got == want, s"buckets=$buckets")
    }
  }

  test("domainCap phase-1 bounds per-task rows under skew") {
    // with buckets=16 and cap=3, phase 2 sees <= 16*3 rows per source even
    // though one source holds the whole corpus
    val docs = (1 to 500).map(id => (id.toLong, "hot", id.toLong % 50))
      .toDF("doc_id", "source", "score")
    val out = CorpusOps.domainCap(docs, "source", "doc_id", "score", 3, 16)
    assert(out.count() == 3)
    // survivors of phase 1 (reconstructed): top-3 of each md5 bucket
    val bucketed = docs.withColumn("_b",
        pmod(conv(substring(md5($"doc_id".cast("string")), 1, 15), 16, 10)
          .cast("long"), lit(16L)))
      .withColumn("_r", row_number().over(
        Window.partitionBy($"source", $"_b").orderBy($"score".desc, $"doc_id")))
      .filter($"_r" <= 3)
    assert(bucketed.count() <= 16L * 3)
  }

  test("weightedBernoulli matches the exact integer rule and expected rate") {
    val docs = (1 to 4000).map(id => (id.toLong, (id % 100 + 1).toLong))
      .toDF("doc_id", "w")
    val wmax = 100L
    val got = CorpusOps.weightedBernoulli(docs, "doc_id", "w", "s1", wmax, 1L, 2L)
      .select($"doc_id", $"w", $"keep").as[(Long, Long, Boolean)]
      .collect()
    // sequential reference: hash60(s1|id)·den·wmax < w·num·2^60 in BigInt
    val two60 = BigInt(1) << 60
    got.foreach { case (id, w, keep) =>
      val h = BigInt(md5Hex(s"s1|$id").take(15), 16)
      assert(keep == (h * 2 * wmax < BigInt(w) * two60), s"doc $id")
    }
    // E[kept] = sum((1/2)·w/wmax) = 4000·(1/2)·(50.5/100) ≈ 1010 ± noise
    val kept = got.count(_._3)
    assert(kept > 850 && kept < 1170, s"kept=$kept far from expectation")
    // determinism: same salt ⇒ same set
    val again = CorpusOps.weightedBernoulli(docs, "doc_id", "w", "s1", wmax, 1L, 2L)
      .filter($"keep").select($"doc_id").as[Long].collect().toSet
    assert(again == got.filter(_._3).map(_._1).toSet)
  }

  test("weightedBernoulli honors the weight-zero and full-rate edges") {
    val docs = Seq((1L, 0L), (2L, 10L), (3L, 10L)).toDF("doc_id", "w")
    // zero weight is never kept
    val z = CorpusOps.weightedBernoulli(docs, "doc_id", "w", "z", 10L, 1L, 1L)
      .filter($"doc_id" === 1L).select($"keep").as[Boolean].head()
    assert(!z)
    // num=0 keeps nothing even at max weight
    val none = CorpusOps.weightedBernoulli(docs, "doc_id", "w", "z", 10L, 0L, 1L)
      .filter($"keep").count()
    assert(none == 0)
    // w=wmax at rate 1 is kept w.p. 1 - hash can't reach 2^60 exactly only
    // if hash < 2^60, which 15 hex chars guarantee
    val all = CorpusOps.weightedBernoulli(docs, "doc_id", "w", "z", 10L, 1L, 1L)
      .filter($"doc_id" =!= 1L).select($"keep").as[Boolean].collect()
    assert(all.forall(identity))
  }

  test("canonical-keyed hash split never separates a near-dup group (no leakage)") {
    // planted near-dup pairs: docs 1~2~3 one group, 5~6 another, 4/7 singles
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "alpha beta gamma delta epsilon zeta eta"),
      (4L, "completely different text about other things entirely"),
      (5L, "one two three four five six seven eight"),
      (6L, "one two three four five six seven eight nine"),
      (7L, "lorem ipsum dolor sit amet consectetur adipiscing"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
    assert(pairs.count() >= 2) // the planted groups exist
    val groups = Dedup.duplicateGroups(pairs, "doc_a", "doc_b")
    val canon = docs.select($"doc_id")
      .join(groups, Seq("doc_id"), "left")
      .withColumn("canonical_id", coalesce($"canonical_id", $"doc_id"))
    val split = CorpusOps.hashSplit(canon, "canonical_id", "split-v1", 30, 30)
      .select($"doc_id", $"split")
    // the leakage-freedom law: no near-dup pair straddles two splits
    val straddle = pairs
      .join(split.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("split", "split_a"), "doc_a")
      .join(split.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("split", "split_b"), "doc_b")
      .filter($"split_a" =!= $"split_b").count()
    assert(straddle == 0)
    // ... and transitively: every member of a component shares one split
    val perGroup = split.join(canon.select($"doc_id", $"canonical_id"), "doc_id")
      .groupBy($"canonical_id")
      .agg(countDistinct($"split").as("nsplits"))
      .filter($"nsplits" > 1).count()
    assert(perGroup == 0)
  }

  test("shardByHash: hash-mod assignment, contiguous per-shard positions") {
    val df = corpus.toDF("doc_id", "lang", "text")
    val got = CorpusOps.shardByHash(df, "doc_id", "shard-v1", 4)
      .select($"doc_id", $"shard", $"pos").as[(Long, Long, Long)]
      .collect().toSeq
    // sequential reference: same salted md5, hex→long, mod, per-shard sort
    val want = corpus.map { case (id, _, _) =>
      val h = java.lang.Long.parseLong(md5Hex(s"shard-v1|$id").take(15), 16)
      (id, h % 4, h)
    }.groupBy(_._2).toSeq.flatMap { case (shard, rows) =>
      rows.sortBy(r => (r._3, r._1)).zipWithIndex
        .map { case ((id, s, _), i) => (id, s, i + 1L) }
    }
    assert(got.toSet == want.toSet)
    // every shard's positions are exactly 1..n (a shard file has no holes)
    got.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted == (1L to rows.size).toSeq)
    }
    // assignment is growth-stable: dropping docs never moves a shard
    val partial = CorpusOps.shardByHash(df.filter($"doc_id" <= 40),
        "doc_id", "shard-v1", 4)
      .select($"doc_id", $"shard").as[(Long, Long)].collect().toMap
    val full = got.map(r => r._1 -> r._2).toMap
    partial.foreach { case (id, s) => assert(full(id) == s) }
  }

  test("globalOrderIndex equals the one-task row_number at every bucket count") {
    val df = corpus.toDF("doc_id", "lang", "text")
    // sequential reference: global rank in (hash, id) order
    val want = corpus.map { case (id, _, _) =>
      (id, java.lang.Long.parseLong(md5Hex(s"order-v1|$id").take(15), 16))
    }.sortBy(r => (r._2, r._1)).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    for (buckets <- Seq(1, 7, 64)) {
      val got = CorpusOps.globalOrderIndex(df, "doc_id", "order-v1", buckets)
        .select($"doc_id", $"gpos").as[(Long, Long)].collect().toMap
      assert(got == want, s"buckets=$buckets")
    }
    // gpos is a permutation of 1..n
    assert(want.values.toSeq.sorted == (1L to corpus.size).toSeq)
  }

  test("budget operators accept a pluggable token counter (real BPE)") {
    import graft.functions.Bpe
    val df = Seq(
      (1L, "en", "spark table stream"),      // 3 BPE tokens (whole words)
      (2L, "en", "customer customer"),       // 12 BPE tokens (6 each)
      (3L, "en", "the the the the")          // 4 BPE tokens
    ).toDF("doc_id", "lang", "text")
    // default (whitespace) and BPE counters budget differently: doc 2 is
    // 2 whitespace tokens but 12 BPE tokens
    val bpeCounts = CorpusOps.packSequences(df, "lang", "doc_id", "text",
        budget = 12L, Bpe.bpeCount(_))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(bpeCounts == Map(1L -> 3L, 2L -> 12L, 3L -> 4L),
      "bin token counts must be the REAL tokenizer's counts")
    val mixed = CorpusOps.mixByTokenBudget(df, "lang", "doc_id", "text",
        quota = 1L, Bpe.bpeCount(_))
      .collect().map(_.getLong(1)).toSet
    // quota 1: only the md5-first doc is admitted, and its n_tokens column
    // carries the BPE count
    assert(mixed.size == 1)
    // default-counter overloads unchanged (delegation law)
    val d1 = CorpusOps.packSequences(df, "lang", "doc_id", "text", 12L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val d2 = CorpusOps.packSequences(df, "lang", "doc_id", "text", 12L,
        graft.functions.TextFunctions.nTokens(_).cast("long"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(d1 == d2)
  }

  test("decontaminateSemantic flags exactly the cross-set cosine hits") {
    // 4-dim embeddings with controlled geometry: ids 0..15 seed the
    // quantizer freely; the planted structure is
    //   eval 100 = (1,0,0,0)
    //   train 200 = (1,0.01,0,0)   — paraphrase leak, cosine ≈ 0.99995
    //   train 201 = (0,0,1,0)      — orthogonal to eval 100
    //   train 202 = (-1,0,0,0)     — anti-parallel, cosine -1
    //   train 203 ≈ train 201      — a train↔train near-pair: NOT a hit
    //   eval 101 = (0,0,0.99,0.14) — close to 201/203 (cosine ≈ .98)
    val base = (0 until 16).map { i =>
      val a = math.cos(i * 0.39); val b = math.sin(i * 0.39)
      (i.toLong, Seq(a.toFloat, b.toFloat, (a * b).toFloat, 0.1f))
    }
    val planted = Seq(
      100L -> Seq(1f, 0f, 0f, 0f),
      200L -> Seq(1f, 0.01f, 0f, 0f),
      201L -> Seq(0f, 0f, 1f, 0f),
      202L -> Seq(-1f, 0f, 0f, 0f),
      203L -> Seq(0f, 0.01f, 1f, 0f),
      101L -> Seq(0f, 0f, 0.99f, 0.14f))
    val emb = (base ++ planted.map { case (id, v) => (id, v) })
      .toDF("vec_id", "embedding")
    val got = CorpusOps.decontaminateSemantic(emb,
        col("vec_id") >= 100L && col("vec_id") < 200L,
        "vec_id", "embedding", nlist = 4, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute-force reference over the SAME cell assignment the operator
    // used: recompute cells, then exact cosine per cross-set pair in-cell
    import graft.operators.{SimilaritySearch => SS}
    val (flat, norms, dim) = SS.seedCentroids(emb, "vec_id", "embedding",
      4, "spec")
    val cells = emb.select(col("vec_id"), graft.functions.VectorFunctions
        .nearestCentroid(col("embedding"), flat, norms, dim).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs = (base ++ planted).map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    def cos(u: Seq[Double], v: Seq[Double]): Double = {
      val dot = u.zip(v).map { case (x, y) => x * y }.sum
      val nu = math.sqrt(u.map(x => x * x).sum)
      val nv = math.sqrt(v.map(x => x * x).sum)
      if (nu == 0 || nv == 0) 0 else dot / (nu * nv)
    }
    val evalIds = vecs.keySet.filter(id => id >= 100L && id < 200L)
    val trainIds = vecs.keySet -- evalIds
    val want = trainIds.toSeq.flatMap { tId =>
      val hits = evalIds.filter(eId =>
        cells(eId) == cells(tId) && cos(vecs(tId), vecs(eId)) >= 0.9)
      if (hits.isEmpty) None
      else Some((tId, hits.size.toLong, hits.min))
    }.toSet
    assert(got == want)
    // the planted leak is flagged; the orthogonal and the anti-parallel
    // train vectors are not flagged BY eval 100; train↔train proximity
    // (201 vs 203) alone never produces a row
    assert(got.exists(_._1 == 200L), "paraphrase leak must be flagged")
    assert(!got.exists(t => t._1 == 202L),
      "anti-parallel vector must not be flagged")
  }
}
