package graft.functions

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KmvSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def agg(k: Int) = new KmvSketch.KmvAgg(k)

  test("reduce keeps the k smallest distinct values, sorted") {
    val a = agg(4)
    val buf = Seq(9L, 3L, 7L, 3L, 1L, 8L, 2L, 1L).foldLeft(a.zero)(a.reduce)
    assert(a.finish(buf).toSeq == Seq(1L, 2L, 3L, 7L))
  }

  test("sub-k input stays exact and deduped") {
    val a = agg(64)
    val buf = Seq(5L, 5L, 1L, 9L).foldLeft(a.zero)(a.reduce)
    assert(a.finish(buf).toSeq == Seq(1L, 5L, 9L))
    assert(KmvSketch.estimate(a.finish(buf), 64) == 3L)
  }

  test("merge == reduce over the concatenation (mergeable partial agg law)") {
    val a = agg(8)
    val xs = (0 until 200).map(i => (i * 2654435761L) % 1000)
    val (l, r) = xs.splitAt(97)
    val merged = a.merge(l.foldLeft(a.zero)(a.reduce), r.foldLeft(a.zero)(a.reduce))
    val direct = xs.foldLeft(a.zero)(a.reduce)
    assert(a.finish(merged).toSeq == a.finish(direct).toSeq)
  }

  test("laws: merge is commutative, associative, idempotent; reduce-order-free") {
    import org.scalacheck.{Gen, rng}
    val k = 6
    val a = agg(k)
    val genHashes: Gen[List[Long]] = for {
      n <- Gen.choose(0, 60)
      hs <- Gen.listOfN(n, Gen.choose(0L, 200L)) // small domain forces dups
    } yield hs
    def sketch(hs: Seq[Long]) = hs.foldLeft(a.zero)(a.reduce)
    def fin(b: KmvSketch.Buf) = a.finish(b).toSeq
    (1 to 12).foreach { seed =>
      val p = Gen.Parameters.default
      val (x, y, z) = (
        genHashes(p, rng.Seed(seed.toLong)).get,
        genHashes(p, rng.Seed(seed + 100L)).get,
        genHashes(p, rng.Seed(seed + 200L)).get)
      val (sx, sy, sz) = (sketch(x), sketch(y), sketch(z))
      assert(fin(a.merge(sx, sy)) == fin(a.merge(sy, sx)), s"commut seed=$seed")
      assert(fin(a.merge(a.merge(sx, sy), sz)) ==
        fin(a.merge(sx, a.merge(sy, sz))), s"assoc seed=$seed")
      assert(fin(a.merge(sx, sx)) == fin(sx), s"idem seed=$seed")
      // partial-aggregation soundness: any split point gives the same sketch
      assert(fin(a.merge(sketch(x.take(x.length / 2)),
        sketch(x.drop(x.length / 2)))) == fin(sx), s"split seed=$seed")
      // replay (at-least-once) folds to the same sketch
      assert(fin(sketch(x ++ x)) == fin(sx), s"replay seed=$seed")
    }
  }

  test("estimate within 3/sqrt(k) of exact on uniform hashes") {
    val k = 64
    val n = 5000
    // md5-like uniform 60-bit hashes via a splitmix-style scramble
    val hs = (1 to n).map { i =>
      var z = i * 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      (z ^ (z >>> 27)) & ((1L << 60) - 1)
    }.distinct
    val a = agg(k)
    val est = KmvSketch.estimate(a.finish(hs.foldLeft(a.zero)(a.reduce)), k).toDouble
    val err = math.abs(est - hs.size) / hs.size
    assert(err <= 3.0 / math.sqrt(k.toDouble), s"est=$est exact=${hs.size} err=$err")
  }

  test("sketch-algebra overlap estimate tracks a known 50%-overlap pair") {
    // A = [0, 2000), B = [1000, 3000): |A∩B| = 1000, |A∪B| = 3000, J = 1/3
    val rows = (0L until 2000L).map(i => ("A", i)) ++
      (1000L until 3000L).map(i => ("B", i))
    val dir = java.nio.file.Files.createTempDirectory("graft-kmv-ov").toString
    spark.createDataFrame(rows).toDF("event_type", "user_id")
      .withColumn("ts", org.apache.spark.sql.functions.current_timestamp())
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("q_kmv_overlap")(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    val (j, u, i) = (r.getAs[Double]("jaccard_est"),
      r.getAs[Long]("union_est"), r.getAs[Long]("inter_est"))
    // KMV k=64: union stderr ~ 1/sqrt(k-2); Jaccard adds hypergeometric
    // noise on the k-sample — generous 2x envelopes, deterministic values
    assert(math.abs(j - 1.0 / 3) <= 0.15, s"jaccard_est=$j")
    assert(math.abs(u - 3000.0) / 3000.0 <= 0.3, s"union_est=$u")
    assert(math.abs(i - 1000.0) / 1000.0 <= 0.5, s"inter_est=$i")
  }

  test("q_approx_distinct_kmv estimate tracks exact distinct on events") {
    val out = graft.SparkEntry.queries("q_approx_distinct_kmv")(spark, TestSpark.sf0001)
      .collect()
    val exact = Tables(spark, TestSpark.sf0001, "events")
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val (ty, est) = (r.getString(0), r.getAs[Long]("n_users_est"))
      val e = exact(ty).toDouble
      // saturated groups: KMV stderr ~ 1/sqrt(k-2); unsaturated: exact
      assert(math.abs(est - e) / e <= 3.0 / math.sqrt(62.0),
        s"$ty: est=$est exact=$e")
    }
  }

  test("semilattice rollup: merging per-partition finished sketches equals " +
      "the direct sketch over all rows, under any partitioning") {
    val k = 6
    val a = agg(k)
    val m = new KmvSketch.KmvMergeAgg(k)
    val xs = (0 until 300).map(i => (i * 2654435761L) % 500)
    def direct = a.finish(xs.foldLeft(a.zero)(a.reduce)).toSeq
    for (parts <- Seq(1, 3, 7, 300)) {
      val finished = xs.grouped((xs.size + parts - 1) / parts)
        .map(g => a.finish(g.foldLeft(a.zero)(a.reduce))).toSeq
      val rolled = m.finish(finished.foldLeft(m.zero)(m.reduce)).toSeq
      assert(rolled == direct, s"parts=$parts")
    }
  }

  test("q_kmv_rollup equals the direct per-type sketch query") {
    val rollup = graft.SparkEntry.queries("q_kmv_rollup")(spark, TestSpark.sf0001)
      .select(col("event_type"), col("n_users_est"), col("kth_hash"))
      .collect().map(r => (r.getString(0), r.getAs[Long](1), r.get(2))).toSeq
    val direct = graft.SparkEntry.queries("q_approx_distinct_kmv")(
        spark, TestSpark.sf0001)
      .select(col("event_type"), col("n_users_est"), col("kth_hash"))
      .collect().map(r => (r.getString(0), r.getAs[Long](1), r.get(2))).toSeq
    assert(rollup == direct)
  }
}
