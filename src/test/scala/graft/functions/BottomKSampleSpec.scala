package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Laws for the bottom-k value sample: the sketch is a pure function of
  * the value SET (order/merge-shape independence), bounded at k, and its
  * estimators match brute-force references.
  */
class BottomKSampleSpec extends AnyFunSuite {

  private val k = 8
  private def agg = new BottomKSample.Agg(k)

  // deterministic full-range mix (murmur3 fmix64): the estimator assumes
  // hashes uniform on [0, 2^60), so a weak scramble breaks it by design
  private def h(v0: Long): Long = {
    var v = v0
    v ^= v >>> 33; v *= 0xff51afd7ed558ccdL
    v ^= v >>> 33; v *= 0xc4ceb9fe1a85ec53L
    v ^= v >>> 33
    v & ((1L << 60) - 1)
  }

  private def sketchOf(vals: Seq[Long]): BottomKSample.Buf =
    vals.foldLeft(agg.zero)((b, v) => agg.reduce(b, (h(v), v)))

  test("law: sketch is independent of arrival order and duplicates") {
    val vals = Seq(5L, 1L, 9L, 1L, 7L, 5L, 3L, 11L, 13L, 2L, 8L, 9L)
    val a = sketchOf(vals)
    val b = sketchOf(scala.util.Random.shuffle(vals ++ vals))
    assert(a.hs.toSeq == b.hs.toSeq && a.vs.toSeq == b.vs.toSeq)
  }

  test("law: merge of split halves equals the whole, any split point") {
    val vals = (1L to 40L)
    (0 to 40 by 7).foreach { cut =>
      val whole = sketchOf(vals)
      val merged = agg.merge(sketchOf(vals.take(cut)), sketchOf(vals.drop(cut)))
      assert(merged.hs.toSeq == whole.hs.toSeq, s"cut=$cut")
      assert(merged.vs.toSeq == whole.vs.toSeq, s"cut=$cut")
    }
  }

  test("sample = the k values with smallest hashes; bounded at k") {
    val vals = (1L to 100L)
    val sk = sketchOf(vals)
    assert(sk.hs.length == k)
    val expect = vals.map(v => (h(v), v)).sorted.take(k)
    assert(sk.hs.toSeq == expect.map(_._1) && sk.vs.toSeq == expect.map(_._2))
  }

  test("quantile picks are integer order statistics, half-up") {
    val vs = Array(10L, 20L, 30L, 40L)
    // m=4: p50 idx = (3*1+1)/2 = 2 -> 30; p90 idx = (3*9+5)/10 = 3 -> 40
    assert(BottomKSample.quantile(vs, 1, 2) == 30L)
    assert(BottomKSample.quantile(vs, 9, 10) == 40L)
    assert(BottomKSample.quantile(vs, 0, 2) == 10L)
    assert(BottomKSample.quantile(Array(7L), 1, 2) == 7L)
  }

  test("distinct estimate: exact below k, within 30% at 10x saturation") {
    val small = sketchOf(Seq(4L, 2L, 9L))
    assert(BottomKSample.estimateDistinct(small.hs, k) == 3L)
    // uniform-ish hashes over 1..200 with k=8: coarse estimator — just pin
    // the error envelope that makes it usable for skew decisions
    val big = sketchOf(1L to 200L)
    val est = BottomKSample.estimateDistinct(big.hs, k)
    assert(est > 60 && est < 700, s"est=$est")
  }
}
