package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val corpus = {
    val rnd = new scala.util.Random(5)
    (0 until 60).map(i => (i.toLong, Array.fill(12)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
  }

  test("brute-force top-k: k rows per query, self excluded, ranks ordered by cosine") {
    val q = corpus.filter(col("vec_id") < 3)
    val out = SimilaritySearch.bruteForceTopK(q, corpus, "vec_id", "embedding", 5)
    assert(out.count() == 15)
    assert(out.filter(col("query_id") === col("neighbor_id")).count() == 0)
    val perQuery = out.groupBy("query_id").agg(count(lit(1)).as("n"))
      .select("n").as[Long].collect()
    assert(perQuery.forall(_ == 5L))
    // ranks are 1..5 and cosine non-increasing within each query
    val rows = out.orderBy("query_id", "rank")
      .select("query_id", "rank", "cosine")
      .as[(Long, Int, Double)].collect().toSeq
    rows.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._2) == Seq(1, 2, 3, 4, 5))
      assert(sorted.sliding(2).forall(p => p.head._3 >= p.last._3 - 1e-15))
    }
  }

  test("brute-force rank-1 is the true nearest neighbor") {
    val q = corpus.filter(col("vec_id") === 0)
    val top = SimilaritySearch.bruteForceTopK(q, corpus, "vec_id", "embedding", 1)
      .select("neighbor_id").as[Long].head()
    // independent computation via the builtin cosine
    val truth = corpus.as("a").crossJoin(corpus.as("b"))
      .filter(col("a.vec_id") === 0 && col("b.vec_id") =!= 0)
      .select(col("b.vec_id"),
        graft.functions.VectorFunctions.cosineBuiltin(
          col("a.embedding").cast("array<double>"),
          col("b.embedding").cast("array<double>")).as("c"))
      .orderBy(col("c").desc).select("vec_id").as[Long].head()
    assert(top == truth)
  }

  test("LSH top-k returns plausible neighbors (recall sanity vs brute force)") {
    val q = corpus.filter(col("vec_id") < 5)
    val bf = SimilaritySearch.bruteForceTopK(q, corpus, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = SimilaritySearch.lshTopK(q, corpus, "vec_id", "embedding",
        k = 3, planes = 6, probes = 6)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(lsh.nonEmpty)
    // every LSH hit must be a real vector pair; overlap with brute force > 0
    assert((lsh intersect bf).nonEmpty)
  }

  test("multi-table LSH (OR-amplification) lifts recall over one table") {
    val q = clustered.filter(col("vec_id") < 8)
    val bf = SimilaritySearch.bruteForceTopK(q, clustered, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recallAt(tables: Int): Double = {
      val lsh = SimilaritySearch.lshTopK(q, clustered, "vec_id", "embedding",
          k = 10, planes = 6, probes = 2, tables = tables)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      (lsh intersect bf).size.toDouble / bf.size
    }
    val one = recallAt(1)
    val eight = recallAt(8)
    assert(eight >= one, s"multi-table recall $eight < single-table $one")
    // on well-separated clusters (intra-cluster cosine ~0.95, per-plane
    // collision ~0.9 → per-table ~0.53 → 8 tables ~1-(0.47)^8 ≈ 0.998)
    assert(eight >= 0.8, s"recall=$eight")
  }

  test("LSH candidate pairs are deduped across tables (no rank inflation)") {
    val q = clustered.filter(col("vec_id") < 3)
    val out = SimilaritySearch.lshTopK(q, clustered, "vec_id", "embedding",
      k = 10, planes = 4, probes = 4, tables = 8)
    val dup = out.groupBy("query_id", "neighbor_id").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    assert(dup == 0)
    // ranks within each query are consecutive from 1
    val ranks = out.select("query_id", "rank").as[(Long, Int)].collect()
      .groupBy(_._1).values.map(_.map(_._2).sorted.toSeq)
    assert(ranks.forall(r => r == (1 to r.length)))
  }

  test("LSH bucket occupancy is bounded on the shipped plane family and " +
       "catches a degenerate family") {
    // a bigger isotropic corpus so the per-bucket expectation is meaningful
    val rnd = new scala.util.Random(23)
    val n = 1024
    val big = (0 until n).map(i =>
      (i.toLong, Array.fill(12)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
    val planes = 6 // expected occupancy = n / 2^6 = 16
    def maxBucket(df: org.apache.spark.sql.DataFrame): Long =
      SimilaritySearch.lshBucketStats(df, "vec_id", "embedding",
          planes = planes, tables = 4)
        .agg(max(col("n"))).as[Long].head()
    val expected = n.toDouble / (1 << planes)
    // the candidate-cost gate: a probed bucket may cost a few times the
    // uniform expectation (hyperplanes through correlated data are never
    // perfectly balanced) but NOT a corpus-sized scan
    val bound = (8 * expected).toLong
    assert(maxBucket(big) <= bound,
      s"shipped plane family exceeds the occupancy bound $bound")

    // degenerate family: zero vectors sketch to one constant bucket —
    // the same gate must fail, loudly, instead of the join silently going
    // quadratic
    val zeros = (0 until n).map(i => (i.toLong, Array.fill(12)(0f)))
      .toDF("vec_id", "embedding")
    assert(maxBucket(zeros) == n.toLong,
      "degenerate sketch must collapse into a single full bucket")
    assert(maxBucket(zeros) > bound,
      "the occupancy gate must catch the degenerate family")
  }

  // clustered corpus: 8 well-separated directions + small noise, so an IVF
  // quantizer must recover the clusters and recall is deterministic-high
  private lazy val clustered = {
    val rnd = new scala.util.Random(17)
    val dim = 12
    val centers = Array.fill(8) {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    (0 until 240).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f))
    }.toDF("vec_id", "embedding")
  }

  test("IVF top-k has high recall vs brute force on clustered data") {
    val q = clustered.filter(col("vec_id") < 8)
    val bf = SimilaritySearch.bruteForceTopK(q, clustered, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = SimilaritySearch.ivfTopK(q, clustered, "vec_id", "embedding",
        k = 10, nlist = 8, nprobe = 2, iters = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (ivf intersect bf).size.toDouble / bf.size
    assert(recall >= 0.9, s"recall=$recall")
    // every query answered with a full k
    val counts = SimilaritySearch.ivfTopK(q, clustered, "vec_id", "embedding",
        10, 8, 2).groupBy("query_id").agg(count(lit(1)).as("n"))
      .select("n").as[Long].collect()
    assert(counts.length == 8 && counts.forall(_ == 10L))
  }

  test("IVF with nprobe = nlist equals brute force exactly") {
    val q = clustered.filter(col("vec_id") < 4)
    val bf = SimilaritySearch.bruteForceTopK(q, clustered, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    val ivf = SimilaritySearch.ivfTopK(q, clustered, "vec_id", "embedding",
        k = 5, nlist = 6, nprobe = 6, iters = 2)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(ivf == bf)
  }

  test("PQ: ADC finds the neighborhood; exact re-rank restores the order") {
    val q = clustered.filter(col("vec_id") < 8)
    val bf = SimilaritySearch.bruteForceTopK(q, clustered, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // pure ADC: quantization collapses WITHIN-cluster ordering (members
    // share codes → tied scores), so recall@10 against a 30-member cluster
    // is structurally ~1/3 — the compressed scan still lands in the right
    // cluster, which is what the re-rank stage builds on
    val adc = SimilaritySearch.pqTopK(q, clustered, "vec_id", "embedding",
        k = 10, m = 3, ncode = 16)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val adcRecall = (adc intersect bf).size.toDouble / bf.size
    assert(adcRecall >= 0.3, s"adc recall=$adcRecall")
    // ADC top-30 + exact re-rank: the production shape, near-exact here
    val rr = SimilaritySearch.pqTopK(q, clustered, "vec_id", "embedding",
        k = 10, m = 3, ncode = 16, rerank = 30)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val rrRecall = (rr intersect bf).size.toDouble / bf.size
    assert(rrRecall >= 0.9, s"rerank recall=$rrRecall")
  }

  test("IVF+PQ (cell pruning + ADC + re-rank) has high recall on clustered data") {
    val q = clustered.filter(col("vec_id") < 8)
    val bf = SimilaritySearch.bruteForceTopK(q, clustered, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivfpq = SimilaritySearch.ivfPqTopK(q, clustered, "vec_id", "embedding",
        k = 10, nlist = 8, nprobe = 3, m = 3, ncode = 16, rerank = 30)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (ivfpq intersect bf).size.toDouble / bf.size
    assert(recall >= 0.8, s"recall=$recall")
  }

  test("PQ encode is deterministic, bounded, and rank-consistent") {
    val q = clustered.filter(col("vec_id") < 4)
    val a = SimilaritySearch.pqTopK(q, clustered, "vec_id", "embedding", 5, 3, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val b = SimilaritySearch.pqTopK(q, clustered, "vec_id", "embedding", 5, 3, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(a == b)
    // full k per query, ranks consecutive from 1
    val byQ = a.groupBy(_._1).values.map(_.map(_._3).sorted.toSeq)
    assert(byQ.forall(_ == (1 to 5)))
    // codes really are m ints per row (the compression contract)
    val picked = clustered
      .select(col("vec_id").cast("string").as("_id"), col("embedding").as("_v"))
      .orderBy(org.apache.spark.sql.functions.md5(col("_id")), col("_id"))
      .limit(16).collect()
    val dim = picked.head.getSeq[Float](1).length
    val cb = new Array[Double](3 * 16 * (dim / 3))
    val codes = clustered.select(
        graft.functions.VectorFunctions.pqEncode(col("embedding"), cb, 3, dim / 3, 16)
          .as("codes"))
      .select(size(col("codes"))).as[Int].collect()
    assert(codes.forall(_ == 3))
  }

  test("persisted LSH index: byte-identical to inline lshTopK, no corpus-side Exchange") {
    val table = "simspec_lsh_index"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    SimilaritySearch.buildLshIndex(corpus, "vec_id", "embedding", table,
      planes = 6, tables = 2, seed = 7L)
    val q = corpus.filter(col("vec_id") < 5)
    val inline = SimilaritySearch.lshTopK(q, corpus, "vec_id", "embedding",
        k = 3, planes = 6, probes = 3, tables = 2, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val indexed = SimilaritySearch.queryLshIndex(spark, table, q, "vec_id",
        "embedding", k = 3, planes = 6, probes = 3, tables = 2, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(indexed == inline)
    assert(indexed.nonEmpty)
    // the amortization contract: the candidate join reads the bucketed
    // table with NO Exchange above its scan, even when the probe side is
    // too big to broadcast (SMJ case: only the probe side shuffles)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val probe = q.select(col("vec_id").as("query_id"), lit(0).as("t"),
        lit(0L).as("bucket"))
      val candJoin = spark.table(table).join(probe, Seq("t", "bucket"))
      candJoin.write.format("noop").mode("overwrite").save()
      val plan = candJoin.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount"),
        s"index scan must be bucketed:\n$plan")
      // exactly ONE shuffle: the probe side's. The index side reads its
      // buckets pre-partitioned — that's the amortization contract.
      val nShuffles = "ShuffleExchange|Exchange hashpartitioning".r
        .findAllMatchIn(plan).size
      assert(nShuffles == 1,
        s"expected only the probe-side shuffle, got $nShuffles:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
  }

  test("incremental LSH index: build + delta insert equals inline over the full corpus") {
    val table = "simspec_lsh_index_delta"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val base = corpus.filter(col("vec_id") % 2 === 0)
    val delta = corpus.filter(col("vec_id") % 2 === 1)
    SimilaritySearch.buildLshIndex(base, "vec_id", "embedding", table,
      planes = 6, tables = 2, seed = 7L)
    SimilaritySearch.insertLshIndex(delta, "vec_id", "embedding", table,
      planes = 6, tables = 2, seed = 7L)
    val q = corpus.filter(col("vec_id") < 5)
    val inline = SimilaritySearch.lshTopK(q, corpus, "vec_id", "embedding",
        k = 3, planes = 6, probes = 3, tables = 2, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val indexed = SimilaritySearch.queryLshIndex(spark, table, q, "vec_id",
        "embedding", k = 3, planes = 6, probes = 3, tables = 2, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(indexed == inline)
    assert(indexed.nonEmpty)
    // the append preserved the bucket layout: an aggregation on the bucket
    // keys runs with ZERO Exchange (both the base and delta files read as
    // pre-partitioned buckets)
    val agg = spark.table(table).groupBy("t", "bucket").count()
    agg.write.format("noop").mode("overwrite").save()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucket-key agg must be shuffle-free after append:\n$plan")
  }

  test("knnClassify: leave-one-out on separated clusters recovers the cluster label") {
    val labeled = clustered.withColumn("label", (col("vec_id") % 8).cast("int"))
    val q = labeled.filter(col("vec_id") < 8) // one query per cluster
    val out = SimilaritySearch.knnClassify(q, labeled, "vec_id", "embedding",
        "label", k = 10, planes = 6, probes = 2, tables = 8)
      .select("query_id", "pred_label", "votes", "n_neighbors")
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(out.map(_._1).sorted == (0L until 8L))
    // invariants: modal votes bounded by neighbor count bounded by k
    assert(out.forall { case (_, _, v, n) => v >= 1 && v <= n && n <= 10 })
    // separated clusters: the modal neighbor label IS the query's cluster
    val correct = out.count { case (id, pred, _, _) => pred == (id % 8) }
    assert(correct >= 7, s"leave-one-out accuracy $correct/8")
  }

  test("clusterPurity: separated clusters give pure cells; counts conserve") {
    val labeled = clustered.withColumn("label", (col("vec_id") % 8).cast("int"))
    val out = SimilaritySearch.clusterPurity(labeled, "vec_id", "embedding",
        "label", nlist = 16)
      .select("cell", "n_vecs", "maj_label", "maj_votes")
      .as[(Int, Long, Int, Long)].collect().toSeq
    assert(out.nonEmpty && out.map(_._1).distinct.length == out.length)
    assert(out.map(_._2).sum == 240L) // every vector lands in exactly one cell
    assert(out.forall { case (_, n, _, v) => v >= 1 && v <= n })
    // well-separated clusters: cells are (near-)pure
    val purity = out.map { case (_, n, _, v) => v.toDouble / n }
    assert(purity.sum / purity.size >= 0.9,
      s"mean purity ${purity.sum / purity.size}")
  }

  test("incremental IVF index: frozen-quantizer delta equals a fresh build over the union") {
    val table = "simspec_ivf_index_delta"
    // split precondition that makes build(base)+insert(delta) == build(union)
    // EXACT: keep the union's nlist md5-smallest ids on the BASE side, so
    // the base-frozen quantizer and a union-derived one coincide (in
    // general a frozen quantizer equals FAISS add-with-fixed-centroids,
    // which a retrained rebuild need not match)
    val pick = clustered.select(col("vec_id").cast("string").as("id"))
      .orderBy(md5(col("id")), col("id")).limit(8).as[String].collect()
      .map(_.toLong)
    val base = clustered.filter(col("vec_id") < 200 || col("vec_id").isin(pick: _*))
    val delta = clustered.filter(col("vec_id") >= 200 && !col("vec_id").isin(pick: _*))
    val nDelta = delta.count()
    assert(nDelta >= 30, s"degenerate split: $nDelta delta rows")
    SimilaritySearch.buildIvfIndex(base, "vec_id", "embedding", table, nlist = 8)
    SimilaritySearch.insertIvfIndex(delta, "vec_id", "embedding", table, nlist = 8)
    val q = clustered.filter(col("vec_id") < 5)
    val inline = SimilaritySearch.ivfTopKSeeded(q, clustered, "vec_id",
        "embedding", k = 3, nlist = 8, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val indexed = SimilaritySearch.queryIvfIndex(spark, table, q, "vec_id",
        "embedding", k = 3, nlist = 8, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(indexed == inline)
    assert(indexed.nonEmpty)
    // every delta row landed in the index, and the appended files kept the
    // cell-bucketed layout (zero-Exchange agg on the bucket key)
    assert(spark.table(table).count() == 240L)
    assert(spark.table(table)
      .filter(col("neighbor_id") >= 200 &&
        !col("neighbor_id").isin(pick: _*)).count() == nDelta)
    val agg = spark.table(table).groupBy("cell").count()
    agg.write.format("noop").mode("overwrite").save()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"cell-key agg must be shuffle-free after append:\n$plan")
    // inserting without a quantizer table is refused loudly
    spark.sql(s"DROP TABLE IF EXISTS ${table}_quantizer")
    val e = intercept[IllegalArgumentException] {
      SimilaritySearch.insertIvfIndex(delta, "vec_id", "embedding", table,
        nlist = 8)
    }
    assert(e.getMessage.contains("quantizer"))
  }

  test("persisted IVF index: byte-identical to inline ivfTopKSeeded") {
    val table = "simspec_ivf_index"
    SimilaritySearch.buildIvfIndex(clustered, "vec_id", "embedding", table,
      nlist = 8)
    val q = clustered.filter(col("vec_id") < 5)
    val inline = SimilaritySearch.ivfTopKSeeded(q, clustered, "vec_id",
        "embedding", k = 3, nlist = 8, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val indexed = SimilaritySearch.queryIvfIndex(spark, table, q, "vec_id",
        "embedding", k = 3, nlist = 8, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(indexed == inline)
    assert(indexed.nonEmpty)
    // rebuild over an existing table (and any orphaned location) must work
    SimilaritySearch.buildIvfIndex(clustered, "vec_id", "embedding", table,
      nlist = 8)
    val again = SimilaritySearch.queryIvfIndex(spark, table, q, "vec_id",
        "embedding", k = 3, nlist = 8, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(again == inline)
  }

  test("IVF drift audit: planted crowding trips exactly the crowded cell; " +
      "an undrifted index trips nothing; poor-fit counts the sign flips") {
    val table = "simspec_ivf_drift"
    SimilaritySearch.buildIvfIndex(clustered, "vec_id", "embedding", table,
      nlist = 8)
    // no-shift audit: shares unchanged, nothing drifts
    val calm = SimilaritySearch.auditIvfIndex(spark, table).collect()
    assert(calm.nonEmpty && calm.forall(_.getAs[Long]("drifted") == 0L))
    assert(calm.forall(r =>
      r.getAs[Long]("n_build") == r.getAs[Long]("n_now") &&
        r.getAs[Long]("share_shift_ppm") == 0L))
    // planted crowding: double one cell via a frozen-quantizer delta
    val cstar = SimilaritySearch.ivfBuildStats(spark, table)
      .orderBy(col("n_build").desc, col("cell")).limit(1).collect()(0).getInt(0)
    val delta = spark.table(table).filter(col("cell") === cstar)
      .select((col("neighbor_id") + 100000L).as("vec_id"),
        col("cv").as("embedding"))
    SimilaritySearch.insertIvfIndex(delta, "vec_id", "embedding", table,
      nlist = 8)
    val shifts = SimilaritySearch.auditIvfIndex(spark, table).collect()
      .map(r => r.getAs[Long]("cell") -> r.getAs[Long]("share_shift_ppm"))
      .toMap
    val cstarShift = shifts(cstar.toLong)
    val maxOther = shifts.collect {
      case (c, s) if c != cstar.toLong => s }.max
    // the crowding signal must clearly separate from the passive shrink
    // every other cell sees (at nlist=8 the shares are big, so the shrink
    // is nontrivial — the LAW is separation, the absolute threshold is
    // configuration)
    assert(cstarShift > 2 * maxOther,
      s"crowded-cell shift $cstarShift must dominate max passive shift $maxOther")
    val thr = (cstarShift + maxOther) / 2
    val hot = SimilaritySearch.auditIvfIndex(spark, table, thr).collect()
      .map(r => r.getAs[Long]("cell") -> r).toMap
    assert(hot(cstar.toLong).getAs[Long]("drifted") == 1L,
      "the crowded cell must trip the rebuild signal")
    assert(hot(cstar.toLong).getAs[Long]("n_now") ==
      2 * hot(cstar.toLong).getAs[Long]("n_build"))
    assert(hot.count(_._2.getAs[Long]("drifted") == 1L) == 1,
      "no uncrowded cell may false-trip between the separation bounds")

    // poor-fit = dot <= 0 with the own-cell centroid: plant vectors
    // anti-correlated with every centroid direction by building a tiny
    // index whose later rows are exact negations of the md5-picked seeds
    import spark.implicits._
    val dim = 4
    val base = (0 until 8).map { i =>
      val v = Array.tabulate(dim)(d => if (d == i % dim) 1.0f else 0.1f)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val t2 = "simspec_ivf_drift_poor"
    SimilaritySearch.buildIvfIndex(base, "vec_id", "embedding", t2, nlist = 2)
    val neg = base.select((col("vec_id") + 100L).as("vec_id"),
      org.apache.spark.sql.functions.transform(col("embedding"),
        x => (-x).cast("float")).as("embedding"))
    SimilaritySearch.insertIvfIndex(neg, "vec_id", "embedding", t2, nlist = 2)
    val audit2 = SimilaritySearch.auditIvfIndex(spark, t2).collect()
    assert(audit2.map(_.getAs[Long]("poor_build")).sum == 0L,
      "aligned build vectors fit their centroids")
    assert(audit2.map(_.getAs[Long]("poor_now")).sum == 8L,
      "every negated delta row is a sign-flip poor fit")
    // an index built before the stats snapshot existed refuses the audit
    spark.sql(s"DROP TABLE IF EXISTS ${t2}_buildstats")
    val e = intercept[IllegalArgumentException] {
      SimilaritySearch.auditIvfIndex(spark, t2)
    }
    assert(e.getMessage.contains("build stats"))
  }

  test("cellOccupancyAudit flags a degenerate cell distribution and clears " +
    "a healthy one (the fixed-nlist 'raise nlist' guard)") {
    // degenerate: identical vectors => all 16 centroids coincide, ties
    // resolve to the lowest cell, the whole corpus lands in ONE cell — the
    // exact shape that silently turns a within-cell candidate join
    // quadratic when nlist is pinned while the corpus grows
    val sameDir = (0 until 100).map(i =>
      (i.toLong, Array.tabulate(12)(d => if (d == 0) 1f else 0.25f)))
      .toDF("vec_id", "embedding")
    val bad = SimilaritySearch.cellOccupancyAudit(
      sameDir, "vec_id", "embedding", nlist = 16).collect().head
    assert(bad.getAs[Long]("n_rows") == 100L)
    assert(bad.getAs[Long]("n_cells_used") == 1L)
    assert(bad.getAs[Long]("max_cell_rows") == 100L)
    assert(bad.getAs[Boolean]("degenerate"),
      "a single-cell collapse must raise the degenerate flag")

    // healthy: the isotropic 1024-vector corpus spreads over the 16
    // md5-seeded cells with max share well under the 4x-ideal line
    val rnd = new scala.util.Random(23)
    val big = (0 until 1024).map(i =>
      (i.toLong, Array.fill(12)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
    val ok = SimilaritySearch.cellOccupancyAudit(
      big, "vec_id", "embedding", nlist = 16).collect().head
    assert(ok.getAs[Long]("n_rows") == 1024L)
    assert(ok.getAs[Long]("n_cells_used") > 8L,
      "isotropic data must populate most cells")
    assert(!ok.getAs[Boolean]("degenerate"),
      s"healthy spread flagged: max=${ok.getAs[Long]("max_cell_rows")}")
    // suggested_nlist law: smallest power of two at <= 256 mean rows/cell
    // (1024 rows => 4), and the bound is tight on both sides
    val sug = ok.getAs[Long]("suggested_nlist")
    assert(sug == 4L)
    assert(sug * 256 >= 1024 && (sug / 2) * 256 < 1024)
  }

  test("resolveNlist: a pin passes through; auto mode (nlist=0) derives the " +
    "audit's suggested_nlist, so a grown corpus is auto-scaled, not " +
    "silently quadratic") {
    val rnd = new scala.util.Random(31)
    val emb = (0 until 1024).map(i =>
      (i.toLong, Array.fill(12)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
    // pinned: untouched — oracle queries stay bit-replayable
    assert(SimilaritySearch.resolveNlist(emb, 16) == 16)
    // auto: matches cellOccupancyAudit's suggested_nlist exactly (the law
    // that ties the in-path guard to the audit operator)
    val sug = SimilaritySearch.cellOccupancyAudit(
      emb, "vec_id", "embedding", nlist = 16).collect().head
      .getAs[Long]("suggested_nlist")
    assert(SimilaritySearch.resolveNlist(emb, 0) == sug)
    // auto tracks growth: at targetCellRows=64 the same corpus wants 4x
    // the cells (1024/64 = 16), so an outgrown pin is superseded by auto
    assert(SimilaritySearch.resolveNlist(emb, 0, targetCellRows = 64L) == 16)
    // auto mode is plumbed end to end: clusterPurity(nlist=0) equals the
    // explicitly-resolved pin (same seed family, same cells)
    val labeled = emb.withColumn("label", pmod(col("vec_id"), lit(3L)))
    val auto = SimilaritySearch.clusterPurity(
      labeled, "vec_id", "embedding", "label", 0).collect().toSet
    val pinned = SimilaritySearch.clusterPurity(
      labeled, "vec_id", "embedding", "label", sug.toInt).collect().toSet
    assert(auto == pinned)
  }
}
