package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Bottom-k VALUE sample (Cohen & Kaplan 2007, "Summarizing data using
  * bottom-k sketches"): keep the (hash, value) pairs with the k smallest
  * (hash, value) keys, where the hash is the 60-bit md5 of the value
  * itself — a deterministic, mergeable, UNIFORM sample of the group's
  * DISTINCT values. Estimators over the distinct-value distribution read
  * straight off the sample: order-statistic quantiles (value picks, zero
  * float arithmetic), and the same KMV distinct-count estimate as
  * [[KmvSketch]].
  *
  * Determinism contract: values are INTEGERS (hash of their decimal string
  * — identical text in every engine, unlike doubles), ties between two
  * values colliding on a 60-bit hash break by the value — so the sample is
  * a pure function of the value SET, independent of arrival or merge
  * order, and a SQL oracle replays it with md5 + row_number exactly.
  *
  * 100 TB shape: same as [[KmvSketch]] — a mergeable bounded partial
  * aggregate (k=64 → ≤1 KB per group per task), O(1) saturated inserts,
  * input rows never leave their map task; only sketches move. This is the
  * sketch that answers "what does the DISTINCT-id distribution look like"
  * (median/p90 of the id space actually touched) where KMV alone answers
  * only "how many".
  */
object BottomKSample {

  /** Parallel arrays sorted by (hash, value), length <= k, distinct pairs. */
  case class Buf(hs: Array[Long], vs: Array[Long])

  class Agg(k: Int) extends Aggregator[(Long, Long), Buf, Buf] {
    require(k >= 2, s"BottomKSample.Agg needs k >= 2, got $k")

    def zero: Buf = Buf(Array.emptyLongArray, Array.emptyLongArray)

    private def lt(h1: Long, v1: Long, h2: Long, v2: Long): Boolean =
      h1 < h2 || (h1 == h2 && v1 < v2)

    def reduce(b: Buf, in: (Long, Long)): Buf = {
      val (h, v) = in
      val n = b.hs.length
      // saturated fast path: reject anything not below the current max key
      if (n == k && !lt(h, v, b.hs(k - 1), b.vs(k - 1))) return b
      // insertion point by (h, v); reject exact duplicates
      var lo = 0; var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (lt(b.hs(mid), b.vs(mid), h, v)) lo = mid + 1 else hi = mid
      }
      if (lo < n && b.hs(lo) == h && b.vs(lo) == v) return b
      val m = math.min(n + 1, k)
      val hs = new Array[Long](m); val vs = new Array[Long](m)
      System.arraycopy(b.hs, 0, hs, 0, lo)
      System.arraycopy(b.vs, 0, vs, 0, lo)
      hs(lo) = h; vs(lo) = v
      System.arraycopy(b.hs, lo, hs, lo + 1, m - lo - 1)
      System.arraycopy(b.vs, lo, vs, lo + 1, m - lo - 1)
      Buf(hs, vs)
    }

    def merge(x: Buf, y: Buf): Buf = {
      if (x.hs.isEmpty) return y
      if (y.hs.isEmpty) return x
      val m = math.min(x.hs.length + y.hs.length, k)
      val hs = new Array[Long](m); val vs = new Array[Long](m)
      var i = 0; var j = 0; var o = 0
      while (o < m && (i < x.hs.length || j < y.hs.length)) {
        val takeX = j >= y.hs.length ||
          (i < x.hs.length && !lt(y.hs(j), y.vs(j), x.hs(i), x.vs(i)))
        val (h, v) = if (takeX) { val t = (x.hs(i), x.vs(i)); i += 1; t }
                     else { val t = (y.hs(j), y.vs(j)); j += 1; t }
        if (o == 0 || hs(o - 1) != h || vs(o - 1) != v) {
          hs(o) = h; vs(o) = v; o += 1
        }
      }
      if (o == m) Buf(hs, vs)
      else Buf(java.util.Arrays.copyOf(hs, o), java.util.Arrays.copyOf(vs, o))
    }

    def finish(b: Buf): Buf = b

    def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
    def outputEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
  }

  /** Order-statistic quantile over the SAMPLED distinct values: sort the
    * sample by value, pick index round_half_up(q·(m−1)) with q = num/den —
    * pure integer arithmetic, so any engine replays the identical pick.
    */
  def quantile(vs: Array[Long], num: Long, den: Long): Long = {
    require(vs.nonEmpty && num >= 0 && num <= den && den > 0)
    val sorted = vs.sorted
    val idx = (((sorted.length - 1) * num + den / 2) / den).toInt
    sorted(idx)
  }

  /** Same KMV distinct estimate as [[KmvSketch.estimate]]: exact below k,
    * `(k−1)·2^60 / h_k` at saturation (identical IEEE expression to the
    * SQL oracle's CASE).
    */
  def estimateDistinct(hs: Array[Long], k: Int): Long =
    if (hs.length < k) hs.length
    else math.floor((k - 1).toDouble * math.pow(2.0, 60) / hs(k - 1).toDouble).toLong
}
