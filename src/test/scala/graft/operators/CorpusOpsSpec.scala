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
}
