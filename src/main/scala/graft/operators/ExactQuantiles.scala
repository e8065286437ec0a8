package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact order statistics over a long-typed column WITHOUT a global sort,
  * a single-partition stage, or per-group memory.
  *
  * The built-in exact `percentile` aggregate buffers every group value in
  * executor memory (OOM on data-sized groups), and `orderBy().limit(r)`
  * ships r rows to the driver — both are non-answers for "median of 10^11
  * latencies". This operator is the classic histogram-bisection search
  * instead: each round partitions the remaining candidate value range into
  * B fixed-width integer buckets, aggregates per-bucket counts (map-side
  * combined, B-bounded shuffle), and descends into the bucket containing
  * the target rank. Integer ranges shrink by a factor of B per round, so
  * round count is <= ceil(64 / log2(B)) = 6 at B = 4096 for ANY long data
  * — and each later round's scan carries a pushed-down range predicate, so
  * parquet row-group stats prune most of the input after round one.
  *
  * Exactness: values are longs, buckets are exact integer arithmetic, and
  * the recursion stops when the candidate range is a single value — ties
  * need no breaking because an order statistic is a VALUE, and every tied
  * row holds it. No floats anywhere ⇒ bit-identical to any SQL engine's
  * rank replay.
  *
  * Driver state per round is one B-entry histogram (declared bounded
  * collect — the codebook/offset-table pattern used by `corpus_global
  * _order` and `Search.bm25TopK`).
  */
object ExactQuantiles {

  /** Value at each 1-based rank of `df` ordered by long `valueCol`.
    *
    * @param ranks 1-based target ranks (1 <= r <= count); out-of-range
    *              ranks throw
    * @param buckets histogram width per round (default 4096)
    * @return the exact order-statistic value per requested rank, in input
    *         order
    */
  def longRanks(df: DataFrame, valueCol: String, ranks: Seq[Long],
                buckets: Int = 4096): Seq[Long] = {
    require(ranks.nonEmpty, "no ranks requested")
    val v = col(valueCol)
    val bounds = df.agg(min(v).as("lo"), max(v).as("hi"),
      count(v).as("n")).head()
    require(!bounds.isNullAt(0), "longRanks: no non-null values")
    val (lo0, hi0, n) = (bounds.getLong(0), bounds.getLong(1), bounds.getLong(2))
    ranks.foreach(r => require(r >= 1 && r <= n,
      s"rank $r out of range [1, $n]"))

    // histograms are memoized on (lo, hi): all ranks share round one, and
    // overlapping descents (p50/p90 of a narrow distribution) share deeper
    // rounds too. Bucketing is TRUE integer division (`div`) — a double
    // `/` would mis-bucket once the span exceeds 2^53.
    val memo = scala.collection.mutable.Map.empty[(Long, Long), Map[Long, Long]]
    def histogram(lo: Long, hi: Long): Map[Long, Long] =
      memo.getOrElseUpdate((lo, hi), {
        val span = hi - lo // >= 0: both ends come from the same column
        val width = span / buckets + 1 // >= 1, and buckets*width > span
        df.filter(v >= lo && v <= hi)
          .groupBy(expr(s"((`$valueCol` - ${lo}L) div ${width}L)").as("b"))
          .agg(count(lit(1)).as("c"))
          .collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      })

    def descend(lo: Long, hi: Long, rank: Long): Long = {
      if (lo == hi) return lo
      // a range spanning more than half the long domain (lo < 0 <= hi with
      // hi - lo overflowing) can't be bucketed by subtraction — split once
      // on the sign and recurse into the half holding the rank (one extra
      // count pass, only ever on round one of pathological data)
      if (lo < 0 && hi - lo < 0) {
        val nLeft = df.filter(v >= lo && v <= -1L).count()
        return if (rank <= nLeft) descend(lo, -1L, rank)
        else descend(0L, hi, rank - nLeft)
      }
      val span = hi - lo
      val width = span / buckets + 1
      val h = histogram(lo, hi)
      var remaining = rank
      var b = 0L
      while (remaining > h.getOrElse(b, 0L)) {
        remaining -= h.getOrElse(b, 0L)
        b += 1
        require(b <= span / width,
          s"rank walked off histogram (lo=$lo hi=$hi rank=$rank)")
      }
      val blo = lo + b * width
      val bhi = math.min(hi, blo + width - 1)
      if (blo == bhi) blo else descend(blo, bhi, remaining)
    }

    ranks.map(r => descend(lo0, hi0, r))
  }

  /** Lower-quantile ranks for a group of size n: rank(q) = max(1, ceil(q*n))
    * computed in exact integer arithmetic ((q_num * n + q_den - 1) / q_den).
    */
  def lowerQuantileRank(n: Long, qNum: Long, qDen: Long): Long =
    math.max(1L, (qNum * n + qDen - 1) / qDen)
}
