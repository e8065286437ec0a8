package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class ExactQuantilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ranks on a known sequence") {
    val df = Seq(5L, 3L, 9L, 1L, 7L).toDF("v")
    assert(ExactQuantiles.longRanks(df, "v", Seq(1L, 3L, 5L)) ===
      Seq(1L, 5L, 9L))
  }

  test("ties: the order statistic is the tied value") {
    val df = Seq(2L, 2L, 2L, 2L, 8L).toDF("v")
    assert(ExactQuantiles.longRanks(df, "v", Seq(1L, 4L, 5L)) ===
      Seq(2L, 2L, 8L))
  }

  test("wide range (> 2^53) buckets exactly") {
    val vals = Seq(Long.MinValue + 10, -1L, 0L, 1L, Long.MaxValue - 10)
    val df = vals.toDF("v")
    assert(ExactQuantiles.longRanks(df, "v", Seq(1L, 3L, 5L)) ===
      Seq(Long.MinValue + 10, 0L, Long.MaxValue - 10))
  }

  test("matches a sequential sort on random data (few buckets => deep descent)") {
    import org.scalacheck.{Gen, rng}
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(-1000000L, 1000000L))
    (1 to 8).foreach { seed =>
      val xs = gen(Gen.Parameters.default, rng.Seed(seed.toLong)).get
      val sorted = xs.sorted
      val ranks = Seq(1L, (xs.size + 1L) / 2, xs.size.toLong)
      val got = ExactQuantiles.longRanks(xs.toDF("v"), "v", ranks,
        buckets = 4)
      assert(got === ranks.map(r => sorted((r - 1).toInt)), s"seed=$seed")
    }
  }

  test("grouped search matches per-group sequential sorts (one scan per round)") {
    import org.scalacheck.{Gen, rng}
    val gen = for {
      g <- Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c"))
      vs <- Gen.listOfN(g.size, Gen.chooseNum(-5000L, 5000L))
    } yield g.zip(vs)
    (1 to 6).foreach { seed =>
      val rows = gen(org.scalacheck.Gen.Parameters.default,
        rng.Seed(seed.toLong)).get
      val byG = rows.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sorted }
      val ranksByGroup = byG.map { case (k, xs) =>
        k -> Seq(1L, (xs.size + 1L) / 2, xs.size.toLong).distinct }
      val got = ExactQuantiles.longRanksGrouped(rows.toDF("g", "v"),
        "g", "v", ranksByGroup, buckets = 4)
      ranksByGroup.foreach { case (k, ranks) =>
        ranks.foreach { r =>
          assert(got((k, r)) === byG(k)((r - 1).toInt), s"seed=$seed g=$k r=$r")
        }
      }
    }
  }

  test("lowerQuantilesGrouped returns (n, rank, value) per group and label") {
    val df = Seq(("x", 10L), ("x", 20L), ("x", 30L), ("y", 7L))
      .toDF("g", "v")
    val got = ExactQuantiles.lowerQuantilesGrouped(df, "g", "v",
      Seq(("p50", 1L, 2L), ("max", 1L, 1L)))
    assert(got(("x", "p50")) === ((3L, 2L, 20L)))
    assert(got(("x", "max")) === ((3L, 3L, 30L)))
    assert(got(("y", "p50")) === ((1L, 1L, 7L)))
    assert(got(("y", "max")) === ((1L, 1L, 7L)))
  }

  test("law: lower quantiles are replication-invariant (ceil(ceil(qRn)/R) = ceil(qn))") {
    // replicating every row R times must not move any lower quantile: the
    // value at rank ceil(q*R*n) of the replicated multiset is the value at
    // rank ceil(q*n) of the original
    val xs = Seq(5L, 3L, 9L, 1L, 7L, 7L, 2L)
    val R = 3
    val rep = Seq.fill(R)(xs).flatten
    for ((qn, qd) <- Seq((1L, 2L), (9L, 10L), (1L, 100L), (99L, 100L))) {
      val v1 = ExactQuantiles.longRanks(xs.toDF("v"), "v",
        Seq(ExactQuantiles.lowerQuantileRank(xs.size, qn, qd))).head
      val vR = ExactQuantiles.longRanks(rep.toDF("v"), "v",
        Seq(ExactQuantiles.lowerQuantileRank(rep.size, qn, qd))).head
      assert(v1 === vR, s"q=$qn/$qd")
    }
  }

  test("lowerQuantileRank is max(1, ceil(q*n))") {
    assert(ExactQuantiles.lowerQuantileRank(10, 1, 2) === 5L)
    assert(ExactQuantiles.lowerQuantileRank(11, 1, 2) === 6L)
    assert(ExactQuantiles.lowerQuantileRank(10, 99, 100) === 10L)
    assert(ExactQuantiles.lowerQuantileRank(1, 1, 100) === 1L)
  }

  test("roundsFor: exact integer descent count (no float-log boundary slip)") {
    assert(ExactQuantiles.roundsFor(BigInt(0), 4096) === 0) // single value
    assert(ExactQuantiles.roundsFor(BigInt(1), 4096) === 1)
    assert(ExactQuantiles.roundsFor(BigInt(4095), 4096) === 1) // N = B
    assert(ExactQuantiles.roundsFor(BigInt(4096), 4096) === 2) // N = B + 1
    // N = B^k exactly — the boundary a floating log can round either way
    assert(ExactQuantiles.roundsFor(BigInt(4096) * 4096 - 1, 4096) === 2)
    assert(ExactQuantiles.roundsFor(BigInt(4096) * 4096, 4096) === 3)
    assert(ExactQuantiles.roundsFor(BigInt(2).pow(63) - 1, 4096) === 6)
    assert(ExactQuantiles.roundsFor(BigInt(1) << 40, 4) === 21)
  }

  test("out-of-range rank throws") {
    val df = Seq(1L, 2L).toDF("v")
    intercept[IllegalArgumentException] {
      ExactQuantiles.longRanks(df, "v", Seq(3L))
    }
  }

  test("grouped quantiles stay distributed at 1e5 groups (round-10 law: " +
    "no per-group driver collect anywhere in the path)") {
    import org.apache.spark.sql.functions._
    // 100k groups x 10 values each; per group g the values are
    // {k*7 + g%3 : k=0..9}, so p50 (rank 5, lower quantile) = 28 + g%3 and
    // p90 (rank 9) = 56 + g%3 — verifiable IN SPARK with zero driver-side
    // group state: the only collect in this test is the 1-row violation
    // count. Before round 10 this call pattern collected one bounds row
    // per group on the driver (the 10^7-group OOM the verdict flagged).
    val nGroups = 100000L
    val df = spark.range(0, nGroups * 10)
      .select((col("id") % nGroups).cast("string").as("g"),
        // integer div, NOT `/` (double division would fuzz the values)
        (expr(s"id div ${nGroups}L") * 7 + (col("id") % nGroups) % 3).as("v"))
    val out = ExactQuantiles.lowerQuantilesGroupedDF(df, "g", "v",
      Seq(("p50", 1L, 2L), ("p90", 9L, 10L)))
    val bad = out.filter(
        !(col("n") === 10L &&
          (col("label") === "p50" &&
            col("value") === lit(28L) + col("group").cast("long") % 3 ||
           col("label") === "p90" &&
            col("value") === lit(56L) + col("group").cast("long") % 3)))
      .count()
    assert(bad === 0L)
    assert(out.count() === nGroups * 2)
  }

  test("law: result plan size is independent of bisection round count " +
    "(final resolved union is lineage-cut before return)") {
    import org.apache.spark.sql.functions._
    // a ~2^40 value span descends ~20 rounds at buckets=4 but only ~4 at
    // buckets=4096; before the final cut the returned frame carried one
    // union branch PER ROUND (32-wide at the stress setting), so its plan
    // size grew with round count. Law: identical plan size at both widths.
    val df = Seq(("g", 0L), ("g", 1L << 40), ("g", 12345L), ("g", 7L))
      .toDF("g", "v")
    def planNodes(buckets: Int): Int =
      ExactQuantiles.lowerQuantilesGroupedDF(df, "g", "v",
          Seq(("p50", 1L, 2L)), buckets)
        .queryExecution.logical.collect { case p => p }.size
    val deep = planNodes(4)
    val shallow = planNodes(4096)
    assert(deep === shallow,
      s"result plan grew with round count: $deep (4 buckets) vs $shallow " +
        "(4096 buckets) — final Lineage.cut missing?")
  }

  test("servedFromCache: top-of-plan caller cache detected, buried or " +
    "absent cache is not") {
    import org.apache.spark.sql.functions._
    val df = Seq(("x", 1L), ("y", 2L)).toDF("g", "v")
    def slimish(d: org.apache.spark.sql.DataFrame) =
      d.select(col("g").cast("string").as("_g"),
        col("v").cast("long").as("_v")).na.drop()
    assert(!ExactQuantiles.servedFromCache(slimish(df)))
    val cached = df.cache()
    try {
      assert(ExactQuantiles.servedFromCache(slimish(cached)))
      // a cache buried under a join must NOT disable the persist: the
      // rounds would re-run the join every scan
      val joined = cached.join(
        cached.select(col("g"), col("v").as("v2")), "g")
      assert(!ExactQuantiles.servedFromCache(
        joined.select(col("g").cast("string").as("_g"),
          col("v").cast("long").as("_v")).na.drop()))
    } finally cached.unpersist(blocking = true)
  }

  test("caller-cached input: same answer, caller's cache left intact, " +
    "no operator-owned entries behind") {
    import org.apache.spark.sql.functions._
    val df = Seq(("x", 10L), ("x", 20L), ("x", 30L), ("y", 7L))
      .toDF("g", "v")
    val expect = ExactQuantiles.lowerQuantilesGrouped(df, "g", "v",
      Seq(("p50", 1L, 2L), ("max", 1L, 1L)))
    spark.sharedState.cacheManager.clearCache()
    val cached = df.cache()
    try {
      val got = ExactQuantiles.lowerQuantilesGrouped(cached, "g", "v",
        Seq(("p50", 1L, 2L), ("max", 1L, 1L)))
      assert(got === expect)
      // the operator must neither unpersist the caller's cache nor leave
      // an entry of its own (the caller's is the only one)
      assert(!spark.sharedState.cacheManager.isEmpty,
        "the caller's cache entry was dropped by the operator")
      cached.unpersist(blocking = true)
      assert(spark.sharedState.cacheManager.isEmpty,
        "an operator-owned cache entry survived the caller's unpersist")
    } finally cached.unpersist(blocking = false)
  }

  test("funnelLatencies joins consecutive reach ords") {
    import org.apache.spark.sql.functions._
    val ev = Seq((1L, 10L, "A"), (1L, 25L, "B"), (2L, 10L, "A"))
      .toDF("user_id", "ord", "typ")
    val got = EventAnalytics.funnelLatencies(ev, "user_id", "ord",
        Seq("a" -> (col("typ") === "A"), "b" -> (col("typ") === "B")))
      .select("step", "user_id", "latency")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((2L, 1L, 15L)))
  }
}
