package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** K-minimum-values (KMV) distinct-count sketch.
  *
  * Keeps the `k` smallest DISTINCT hash values per group; the classic
  * bottom-k estimator ("Distinct-Values Queries", Bar-Yossef et al. 2002)
  * then reads the distinct count off the k-th smallest value:
  * `D ≈ (k-1) * H / h_k` for hashes uniform on [0, H).
  *
  * Why this exists next to HLL++ (`approx_count_distinct`): HLL register
  * contents are engine-specific, so an HLL estimate can never be verified
  * by an independent SQL engine. KMV over an md5-derived hash is
  * *deterministic and engine-neutral* — DuckDB replays the identical
  * sketch with `md5`/`row_number`, making the production sketch path
  * itself oracle-checkable (see `q_approx_distinct_kmv` in SparkEntry).
  *
  * 100 TB shape: a mergeable bounded partial aggregate — each task carries
  * at most `k` longs per group (k=64 → 512 bytes), merges are sorted-array
  * unions, and there is no exact-distinct shuffle anywhere: the input rows
  * never leave their map task, only sketches move. Per-row cost is O(1)
  * once the sketch saturates (reject `h >= max` without a search).
  */
object KmvSketch {

  /** Mergeable buffer: sorted distinct hash values, length <= k. */
  case class Buf(vals: Array[Long])

  class KmvAgg(k: Int) extends Aggregator[Long, Buf, Array[Long]] {
    require(k >= 2, s"KmvAgg needs k >= 2, got $k")

    def zero: Buf = Buf(Array.emptyLongArray)

    def reduce(b: Buf, h: Long): Buf = {
      val a = b.vals
      // saturated-sketch fast path: almost every row lands here at scale
      if (a.length == k && h >= a(k - 1)) return b
      val i = java.util.Arrays.binarySearch(a, h)
      if (i >= 0) return b // already tracked
      val ip = -i - 1
      val n = math.min(a.length + 1, k)
      val out = new Array[Long](n)
      System.arraycopy(a, 0, out, 0, ip)
      out(ip) = h
      System.arraycopy(a, ip, out, ip + 1, n - ip - 1)
      Buf(out)
    }

    def merge(x: Buf, y: Buf): Buf = {
      val a = x.vals; val b = y.vals
      if (a.isEmpty) return y
      if (b.isEmpty) return x
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var o = 0
      while (o < out.length && (i < a.length || j < b.length)) {
        val take =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) { val v = a(i); i += 1; v }
          else { val v = b(j); j += 1; v }
        if (o == 0 || out(o - 1) != take) { out(o) = take; o += 1 }
      }
      Buf(if (o == out.length) out else java.util.Arrays.copyOf(out, o))
    }

    def finish(b: Buf): Array[Long] = b.vals

    def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Re-aggregates FINISHED sketches (the `Array[Long]` a KmvAgg emits):
    * the rollup half of the sketch-table pattern — persist per-(coarse
    * key, e.g. day) sketches once, then answer distinct counts over any
    * key combination by merging 512-byte arrays, never re-touching raw
    * rows. Sound because bottom-k is a semilattice: bottomK(A ∪ B) =
    * merge(bottomK(A), bottomK(B)), so a rollup of daily sketches is
    * BIT-IDENTICAL to a direct sketch over the raw rows (pinned in
    * `KmvSketchSpec` and by the `q_kmv_rollup` oracle).
    */
  class KmvMergeAgg(k: Int) extends Aggregator[Array[Long], Buf, Array[Long]] {
    private val inner = new KmvAgg(k)
    def zero: Buf = inner.zero
    def reduce(b: Buf, arr: Array[Long]): Buf =
      if (arr == null) b else inner.merge(b, Buf(arr))
    def merge(x: Buf, y: Buf): Buf = inner.merge(x, y)
    def finish(b: Buf): Array[Long] = b.vals
    def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Estimate from a finished sketch: exact when the sketch never
    * saturated, `(k-1) * 2^60 / h_k` otherwise (hashes are 60-bit —
    * 15 hex chars of md5 — so H = 2^60). Mirrors the SQL-side CASE in the
    * oracle exactly (same IEEE double ops, same floor).
    */
  def estimate(mins: Array[Long], k: Int): Long =
    if (mins.length < k) mins.length
    else math.floor((k - 1).toDouble * math.pow(2.0, 60) / mins(k - 1).toDouble).toLong
}
