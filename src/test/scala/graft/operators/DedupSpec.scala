package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dedup operator laws on synthetic docs with planted near-duplicates, plus
  * agreement between the approximate (LSH) and exact operators.
  */
class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 30 base docs + planted near-dups: 100↔0 (1-word edit), 101↔1 (exact copy)
  private lazy val docs = {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
      "theta", "iota", "kappa")
    val base = (0 until 30).map { i =>
      (i.toLong, Seq.fill(40)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val d0 = base(0)._2.split(" ").updated(5, "EDITED").mkString(" ")
    (base :+ (100L, d0) :+ (101L, base(1)._2)).toDF("doc_id", "text")
  }

  test("exact dedupe groups identical texts only") {
    val out = Dedup.exact(docs, "doc_id", "text")
    val dups = out.filter(col("n_copies") > 1).collect()
    assert(dups.length == 1)
    assert(dups.head.getAs[Long]("canonical_id") == 1L) // min(1, 101)
    assert(out.agg(sum("n_copies")).as[Long].head() == 32L) // conservation
  }

  test("ngram jaccard finds planted near-dups and nothing else at 0.8") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 100L), (1L, 101L)))
  }

  test("df-capped pairs: subset of exact, equal under a generous cap, and " +
    "the recall contract holds (rare-shingle pairs are never missed)") {
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val exact = keys(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8))
    // generous cap (> corpus size): every shingle is "rare", the blocking
    // is complete, so the capped output IS the exact output
    val generous = keys(Dedup.ngramJaccardPairsCapped(
      docs, "doc_id", "text", 3, 0.8, maxDf = 1000L))
    assert(generous == exact)
    // tight cap: still a subset of exact (verify is exact-jaccard either
    // way — the cap can only remove candidates, never add false pairs)
    val tight = keys(Dedup.ngramJaccardPairsCapped(
      docs, "doc_id", "text", 3, 0.8, maxDf = 2L))
    assert(tight.subsetOf(exact))
    // recall contract: any exact pair sharing >= 1 shingle with df <= cap
    // must survive the cap. Compute per-shingle dfs independently.
    val dfBy = docs.select(col("doc_id"),
        explode(Dedup.shingleSet(col("text"), 3)).as("g"))
      .groupBy("g").agg(countDistinct(col("doc_id")).as("df"))
    val shByDoc = docs.select(col("doc_id"),
        Dedup.shingleSet(col("text"), 3).as("s"))
      .as[(Long, Seq[String])].collect().toMap
    val dfs = dfBy.as[(String, Long)].collect().toMap
    val promised = exact.filter { case (a, b) =>
      shByDoc(a).toSet.intersect(shByDoc(b).toSet).exists(dfs(_) <= 2L) }
    assert(promised.subsetOf(tight),
      s"capped output missed contractually-promised pairs: ${promised -- tight}")
  }

  test("minhash LSH pairs equal exact ngram pairs on planted data") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("doc_a", "doc_b", "jaccard").orderBy("doc_a").collect().toSeq
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 64, 16, 0.8)
      .select("doc_a", "doc_b", "jaccard").orderBy("doc_a").collect().toSeq
    assert(lsh == exact) // verification step makes LSH exact-on-candidates
  }

  test("incrementalGroups == duplicateGroups over the pair union " +
    "(merge, extend, new-only, and untouched components all exercised)") {
    def groups(pairs: Seq[(Long, Long)]) =
      Dedup.duplicateGroups(pairs.toDF("a", "b"), "a", "b")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "canonical_id").as[(Long, Long)].collect().toMap
    // old components: {1,2}, {5,6}, {10,11,12}, {30,31} (untouched)
    val p1 = Seq((1L, 2L), (5L, 6L), (10L, 11L), (11L, 12L), (30L, 31L))
    // new pairs: merge {1,2}+{5,6}; extend {10..12} with new doc 13;
    // brand-new component {20,21}
    val p2 = Seq((2L, 5L), (12L, 13L), (20L, 21L))
    val incr = asMap(Dedup.incrementalGroups(groups(p1),
      p2.toDF("a", "b"), "a", "b"))
    val full = asMap(groups(p1 ++ p2))
    assert(incr == full)
    assert(incr((6L)) == 1L)   // merged across old components
    assert(incr((13L)) == 10L) // new doc joined an old component
    assert(incr((21L)) == 20L) // new-only component
    assert(incr((31L)) == 30L) // untouched component passes through
    // randomized law: random old/new pair splits agree with the full CC
    val rnd = new scala.util.Random(31)
    (1 to 4).foreach { trial =>
      val all = Seq.fill(30)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter(p => p._1 != p._2)
      val (o, n) = all.splitAt(all.size / 2)
      if (o.nonEmpty && n.nonEmpty) {
        val i2 = asMap(Dedup.incrementalGroups(groups(o), n.toDF("a", "b"),
          "a", "b"))
        assert(i2 == asMap(groups(o ++ n)), s"trial=$trial")
      }
    }
    // empty delta: the map passes through unchanged
    val noop = asMap(Dedup.incrementalGroups(groups(p1),
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b"))
    assert(noop == asMap(groups(p1)))
  }

  test("incremental near-dup index: delta-vs-corpus pairs equal the inline cross pairs") {
    val table = "dedupspec_mh_index"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // corpus = base docs; delta = the planted near-dups (ids 100, 101)
    val corpus = docs.filter(col("doc_id") < 100)
    val delta = docs.filter(col("doc_id") >= 100)
    Dedup.buildMinhashIndex(corpus, "doc_id", "text", table,
      n = 3, k = 64, bands = 16)
    val got = Dedup.incrementalNearDupPairs(delta, corpus, "doc_id", "text",
        table, n = 3, k = 64, bands = 16, threshold = 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // the cross slice of the full inline pair set (old < 100 <= new)
    val want = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 64, 16, 0.8)
      .filter(col("doc_a") < 100 && col("doc_b") >= 100)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got === want)
    assert(got === Set((0L, 100L), (1L, 101L)))

    // fold the delta in; the NEXT batch (an exact copy of doc 100) must be
    // caught against the appended rows, and the bucket layout must survive
    // the append (zero-Exchange agg on the bucket keys)
    Dedup.insertMinhashIndex(delta, "doc_id", "text", table,
      n = 3, k = 64, bands = 16)
    val next = docs.filter(col("doc_id") === 100)
      .select((col("doc_id") + 100).as("doc_id"), col("text"))
    val caught = Dedup.incrementalNearDupPairs(next,
        docs.withColumnRenamed("doc_id", "doc_id"), "doc_id", "text", table,
        n = 3, k = 64, bands = 16, threshold = 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(caught === Set((0L, 200L), (100L, 200L)),
      s"delta-appended rows must participate: $caught")
    val agg = spark.table(table).groupBy("band", "bhash").count()
    agg.write.format("noop").mode("overwrite").save()
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
      "bucket-key agg must be shuffle-free after append")
  }

  test("simhash blocking finds the exact copy at distance 0") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 3)
      .select("doc_a", "doc_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs.contains((1L, 101L, 0)))
    assert(pairs.forall(_._3 <= 3))
  }

  test("embedding LSH pairs are a subset of brute-force threshold pairs") {
    val rnd = new scala.util.Random(13)
    val vecs = (0 until 40).map(i => (i.toLong, Array.fill(16)(rnd.nextFloat() - 0.5f)))
    // plant: 200 = copy of 0 with tiny noise
    val planted = vecs :+ (200L, vecs(0)._2.map(x => x + 0.001f))
    val df = planted.toDF("vec_id", "embedding")
    val lsh = Dedup.embeddingPairs(df, "vec_id", "embedding", planes = 8, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.contains((0L, 200L))) // identical sketch → always a candidate
    // verify: every reported pair truly exceeds the threshold
    val withCos = Dedup.embeddingPairs(df, "vec_id", "embedding", 8, 0.9)
      .select("cosine").as[Double].collect()
    assert(withCos.forall(_ >= 0.9))
  }

  test("duplicateGroups assigns min-id canonical labels per component") {
    // components: {1,2,3} via chain 1-2, 2-3; {10,11}; {20,21,22} via star
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (20L, 22L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.duplicateGroups(pairs, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("duplicateGroups on a long chain converges within round budget") {
    val chain = (0 until 40).map(i => (i.toLong, i.toLong + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.duplicateGroups(chain, "doc_a", "doc_b", maxRounds = 10)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 41 && got.values.forall(_ == 0L))
  }

  test("duplicateGroups rejects non-numeric ids instead of dropping them") {
    val pairs = Seq(("a", "b"), ("b", "c")).toDF("doc_a", "doc_b")
    val e = intercept[IllegalArgumentException] {
      Dedup.duplicateGroups(pairs, "doc_a", "doc_b").collect()
    }
    assert(e.getMessage.contains("non-numeric id"))
  }

  test("duplicateGroups throws on an exhausted round budget, not silently") {
    val chain = (0 until 40).map(i => (i.toLong, i.toLong + 1)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException] {
      Dedup.duplicateGroups(chain, "doc_a", "doc_b", maxRounds = 2).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("end-to-end: ngram pairs -> canonical groups on planted dups") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
    val groups = Dedup.duplicateGroups(pairs, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    assert(groups == Map(0L -> 0L, 100L -> 0L, 1L -> 1L, 101L -> 1L))
  }

  test("salted verify joins return the exact same pairs on a skewed corpus") {
    // adversarial skew: one viral text duplicated across 60 docs (every
    // pair candidate, every verify row keyed on the same few docs) plus a
    // hot shingle planted in half the normal docs — the shape that pins a
    // single reducer at 100 TB when the verify join is unsalted
    val rnd = new scala.util.Random(7)
    val vocab = Vector("red", "blue", "green", "gold", "gray", "teal")
    val viral = Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val hot = "the quick brown fox" // 4-token hot shingle seed
    val skewed = ((0 until 60).map(i => (i.toLong, viral)) ++
      (100 until 160).map { i =>
        val body = Seq.fill(25)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
        (i.toLong, if (i % 2 == 0) s"$hot $body" else body)
      }).toDF("doc_id", "text")

    val plainJ = Dedup.ngramJaccardPairs(skewed, "doc_id", "text", 3, 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val saltedJ = Dedup.ngramJaccardPairs(skewed, "doc_id", "text", 3, 0.8,
        saltVerify = 8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(saltedJ == plainJ)
    assert(plainJ.count { case (a, b) => a < 60 && b < 60 } == 60 * 59 / 2,
      "viral clique must survive verification")

    val plainM = Dedup.minhashLshPairs(skewed, "doc_id", "text",
        n = 3, k = 64, bands = 16, threshold = 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val saltedM = Dedup.minhashLshPairs(skewed, "doc_id", "text",
        n = 3, k = 64, bands = 16, threshold = 0.8, saltVerify = 8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(saltedM == plainM)

    // the mechanism actually spreads: one hot doc's candidate rows land on
    // >1 salt value (salt = xxhash64(whole row) mod salts, the exact
    // expression SaltedJoin applies), so its verify work fans out across
    // reducers instead of pinning one
    val hotPairs = (1L until 60L).map(b => (0L, b)).toDF("doc_a", "doc_b")
    val spread = hotPairs
      .withColumn("_salt", pmod(xxhash64(col("doc_a"), col("doc_b")), lit(8L)))
      .select(countDistinct(col("_salt"))).as[Long].head()
    assert(spread > 1L, "hot doc's candidate rows all hashed to one salt")
  }

  test("verify salt derives automatically from candidate skew — no caller parameter") {
    // the heuristic: one viral doc in every candidate pair must derive > 1
    val hot = (1L to 100L).map(b => (0L, b)).toDF("doc_a", "doc_b")
    val sHot = Dedup.deriveVerifySalt(hot)
    assert(sHot > 1, s"viral candidate list must derive salt > 1, got $sHot")
    // designed bound: hottest key spread to ≈4× the mean rows per task
    // (mean degree = 200 appearances / 101 docs)
    assert(100.0 / sHot <= 4.0 * (200.0 / 101.0) + 1.0,
      s"salt $sHot leaves the hot key above the 4×mean bound")
    // uniform candidates derive 1 — the plan is unchanged when skew is absent
    val uniform = (0 until 50).map(i => (2L * i, 2L * i + 1))
      .toDF("doc_a", "doc_b")
    assert(Dedup.deriveVerifySalt(uniform) == 1)
    assert(Dedup.deriveVerifySalt(uniform.limit(0)) == 1) // empty-safe

    // end to end: the no-argument default (auto) equals explicit unsalted
    // results on a corpus with a viral doc in half of all pairs
    val rnd = new scala.util.Random(3)
    val vocab = Vector("ash", "oak", "elm", "fir", "yew", "bay")
    val viral = Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val docs = ((0 until 40).map(i => (i.toLong, viral)) ++
      (100 until 140).map(i => (i.toLong,
        Seq.fill(25)(vocab(rnd.nextInt(vocab.size))).mkString(" "))))
      .toDF("doc_id", "text")
    val auto = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val unsalted = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8,
        saltVerify = 1)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(auto == unsalted && auto.nonEmpty)
  }

  test("winnowContainmentPairs is asymmetric: prefix-copy contained one way only") {
    // doc 2 = doc 1's text plus a long distinct tail: nearly all of doc 1's
    // fingerprints appear in doc 2 (contained), but doc 2's tail
    // fingerprints don't appear in doc 1 (not contained the other way).
    // doc 3 is unrelated noise.
    val base = (1 to 60).map(i => s"tok${i * 7 % 97}").mkString(" ")
    val tail = (1 to 60).map(i => s"ext${i * 13 % 89}").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base + " " + tail),
      (3L, (1 to 80).map(i => s"zzz${i * 17 % 83}").mkString(" "))
    ).toDF("doc_id", "text")
    val got = Dedup.winnowContainmentPairs(docs, "doc_id", "text",
        n = 3, w = 4, maxDf = 20, thresh = 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)), s"1 should be contained in 2, got $got")
    assert(!got.contains((2L, 1L)), s"2 must NOT be contained in 1, got $got")
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated doc 3 must not pair, got $got")
  }

  test("winnowContainmentPairs rejects non-numeric ids instead of collapsing them") {
    // without the check, "x" and "y" both cast to null and collapse into ONE
    // doc_id group — the same silent-merge failure duplicateGroups guards
    val text = (1 to 60).map(i => s"tok${i * 7 % 97}").mkString(" ")
    val docs = Seq(("x", text), ("y", text)).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.winnowContainmentPairs(docs, "doc_id", "text",
        n = 3, w = 4, maxDf = 20, thresh = 0.8).collect()
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: chain(x.getCause))
    assert(chain(e).exists(m => m != null && m.contains("winnowContainmentPairs")),
      s"expected the fail-fast message, got: $e")
  }

  test("lineDedupe drops corpus-frequent lines, keeps order, counts honestly") {
    val docs = Seq(
      (1L, "COOKIE BANNER\nunique one\nNAV MENU\nunique two"),
      (2L, "COOKIE BANNER\nother text\nNAV MENU"),
      (3L, "NAV MENU\nCOOKIE BANNER\nthird body"),
      (4L, "COOKIE BANNER\nCOOKIE BANNER")  // all lines boilerplate
    ).toDF("doc_id", "text")
    val got = Dedup.lineDedupe(docs, "doc_id", "text", maxDf = 2)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    // COOKIE BANNER df=4, NAV MENU df=3 -> dropped; everything else df=1
    assert(got(0) == ((1L, "unique one\nunique two", 2L, 2L)))
    assert(got(1) == ((2L, "other text", 1L, 2L)))
    assert(got(2) == ((3L, "third body", 1L, 2L)))
    // doc 4: repeated line counts once for df but BOTH occurrences drop
    assert(got(3) == ((4L, "", 0L, 2L)))
  }

  test("lineDedupe keeps null-text docs (empty-line contract, no silent drop)") {
    val docs = Seq((1L, "real line"), (2L, null)).toDF("doc_id", "text")
    val got = Dedup.lineDedupe(docs, "doc_id", "text", maxDf = 1)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(got.length == 2, "null-text doc must survive")
    assert(got(1)._1 == 2L && got(1)._3 == 1L) // one (empty) line kept
  }

  test("lineDedupe within-doc repeats below the df cap survive in position") {
    val docs = Seq((1L, "a\nb\na"), (2L, "c")).toDF("doc_id", "text")
    val got = Dedup.lineDedupe(docs, "doc_id", "text", maxDf = 1)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    // "a" appears twice in doc 1 but in only ONE distinct doc -> df=1 -> kept
    assert(got(0) == ((1L, "a\nb\na", 3L, 0L)))
    assert(got(1) == ((2L, "c", 1L, 0L)))
  }

  test("law: lineDedupe equals the sequential reference on random corpora") {
    import org.scalacheck.{Gen, rng}
    val genCorpus: Gen[(Int, List[(Long, String)])] = for {
      maxDf <- Gen.choose(1, 3)
      nDocs <- Gen.choose(1, 12)
      docs <- Gen.sequence[List[(Long, String)], (Long, String)](
        (0 until nDocs).map { i =>
          for {
            nLines <- Gen.choose(0, 6)
            lines <- Gen.listOfN(nLines, Gen.oneOf(
              "banner", "menu", "footer", s"uniq-$i-a", s"uniq-$i-b", ""))
          } yield (i.toLong, lines.mkString("\n"))
        })
    } yield (maxDf, docs)
    (1 to 6).foreach { seed =>
      val (maxDf, docs) =
        genCorpus(Gen.Parameters.default, rng.Seed(seed.toLong)).get
      // sequential reference: df over distinct docs, drop, order-preserving
      // rebuild. split with limit -1, matching Spark's split (keeps trailing
      // empty lines)
      val df = docs.flatMap { case (id, t) => t.split("\n", -1).distinct.map((_, id)) }
        .groupBy(_._1).map { case (l, xs) => l -> xs.size }
      val expect = docs.map { case (id, t) =>
        val all = t.split("\n", -1).toSeq
        val kept = all.filter(l => df(l) <= maxDf)
        (id, kept.mkString("\n"), kept.size.toLong, (all.size - kept.size).toLong)
      }.toSet
      val got = Dedup.lineDedupe(docs.toDF("doc_id", "text"), "doc_id", "text",
          maxDf = maxDf)
        .as[(Long, String, Long, Long)].collect().toSet
      assert(got == expect, s"seed=$seed maxDf=$maxDf")
    }
  }

  test("semanticDedupPairs finds same-cell near-dups and nothing cross-cell") {
    // two tight, well-separated directions + one planted near-dup per
    // direction; any sane cell assignment separates the two directions
    val rnd = new scala.util.Random(7)
    def jitter(base: Array[Float], eps: Float): Array[Float] =
      base.map(x => x + (rnd.nextFloat() - 0.5f) * eps)
    val a = Array.fill(8)(rnd.nextFloat() + 0.5f)
    val b = a.map(-_)
    val vecs = (
      (0 until 6).map(i => (i.toLong, jitter(a, 0.05f))) ++
      (6 until 12).map(i => (i.toLong, jitter(b, 0.05f)))
    ).toDF("vec_id", "embedding")
    val got = Dedup.semanticDedupPairs(vecs, "vec_id", "embedding",
        nlist = 4, threshold = 0.98)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.nonEmpty, "tight same-direction pairs must be found")
    // opposite directions can never clear cosine 0.98 — no cross pairs
    assert(got.forall { case (x, y) => (x < 6) == (y < 6) }, s"got $got")
    // ordering contract
    assert(got.forall { case (x, y) => x < y })
  }

  test("semanticDedupPairs auto-nlist (0) equals the explicitly-resolved " +
    "pin — a corpus outgrowing a historical pin auto-scales") {
    val rnd = new scala.util.Random(11)
    def jitter(base: Array[Float], eps: Float): Array[Float] =
      base.map(x => x + (rnd.nextFloat() - 0.5f) * eps)
    val a = Array.fill(8)(rnd.nextFloat() + 0.5f)
    val b = a.map(-_)
    val vecs = (
      (0 until 6).map(i => (i.toLong, jitter(a, 0.05f))) ++
      (6 until 12).map(i => (i.toLong, jitter(b, 0.05f)))
    ).toDF("vec_id", "embedding")
    val resolved = graft.operators.SimilaritySearch.resolveNlist(vecs, 0)
    val auto = Dedup.semanticDedupPairs(vecs, "vec_id", "embedding",
        nlist = 0, threshold = 0.98)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val pinned = Dedup.semanticDedupPairs(vecs, "vec_id", "embedding",
        nlist = resolved, threshold = 0.98)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(auto == pinned)
    assert(auto.nonEmpty)
  }

  test("canonicalRepresentatives keeps the best-scored member, ties to min id") {
    val groups = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), // group 1: scores 5, 9, 9 -> keep 2
      (7L, 7L), (8L, 7L)            // group 7: scores 4, 4  -> keep 7
    ).toDF("doc_id", "canonical_id")
    val scored = Seq((1L, 5L), (2L, 9L), (3L, 9L), (7L, 4L), (8L, 4L))
      .toDF("doc_id", "s")
    val got = Dedup.canonicalRepresentatives(groups, scored, "doc_id", "s")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 3L, 23L), (7L, 7L, 2L, 8L)))
  }

  test("repeatedSubstringSpans finds exactly the planted repeated spans") {
    // w0..w19 are all distinct, so the ONLY repeated 4-grams are planted
    def w(i: Int) = s"w$i"
    val shared = (0 until 6).map(w).mkString(" ") // 6-token shared substring
    val d1 = shared + " " + (10 until 20).map(w).mkString(" ")
    val d2 = (20 until 24).map(w).mkString(" ") + " " + shared
    val d3 = (30 until 34).map(w).mkString(" ") + " " +
      (40 until 44).map(w).mkString(" ") + " " + (40 until 44).map(w).mkString(" ")
    val got = Dedup.repeatedSubstringSpans(
        Seq((1L, d1), (2L, d2), (3L, d3), (4L, "too short"))
          .toDF("doc_id", "text"), "doc_id", "text", n = 4, minCount = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // d1: shared at tokens [0,6); d2: shared at [4,10);
    // d3: "w40..w43 w40..w43" repeats the 4-gram w40 w41 w42 w43 at
    // positions 4 and 8 -> marks [4,8) and [8,12) abut -> one span [4,12)
    assert(got == Seq((1L, 0L, 6L, 6L), (2L, 4L, 10L, 6L), (3L, 4L, 12L, 8L)))
  }

  test("law: repeated-substring spans are sorted, disjoint, >= n tokens, " +
       "in bounds, and cover every repeated n-gram position") {
    val n = 3
    val spans = Dedup.repeatedSubstringSpans(docs, "doc_id", "text", n, 2)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    val texts = docs.as[(Long, String)].collect().toMap
    assert(spans.nonEmpty, "the planted dup docs must produce spans")
    for ((id, ss) <- spans; s <- ss) {
      assert(s._4 == s._3 - s._2 && s._4 >= n, s"span too short: $s")
      assert(s._2 >= 0 && s._3 <= texts(id).split("\\s+").length.toLong,
        s"span out of bounds: $s")
    }
    for ((_, ss) <- spans; Seq(a, b) <- ss.sliding(2) if ss.size > 1)
      assert(a._3 < b._2, s"spans must be disjoint and non-abutting: $a $b")
    // completeness: every position whose n-gram repeats corpus-wide lies
    // inside some span (sequential reference over the whole corpus)
    val gramCounts = texts.toSeq.flatMap { case (_, t) =>
      t.split("\\s+").sliding(n).filter(_.length == n).map(_.mkString(" "))
    }.groupBy(identity).view.mapValues(_.size).toMap
    for ((id, t) <- texts) {
      val toks = t.split("\\s+")
      toks.sliding(n).zipWithIndex.filter(_._1.length == n).foreach {
        case (g, p) if gramCounts(g.mkString(" ")) >= 2 =>
          assert(spans.get(id).exists(_.exists(s => s._2 <= p && p + n <= s._3)),
            s"repeated gram at doc $id pos $p not covered")
        case _ => ()
      }
    }
  }
}
