package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Exact order statistics over long-typed columns WITHOUT a global sort,
  * a single-partition stage, or per-group memory.
  *
  * The built-in exact `percentile` aggregate buffers every group value in
  * executor memory (OOM on data-sized groups), and `orderBy().limit(r)`
  * ships r rows to the driver — both are non-answers for "median of 10^11
  * latencies". This operator is the classic histogram-bisection search
  * instead: each round partitions every still-unresolved (group, rank)
  * task's candidate value range into B fixed-width integer buckets,
  * aggregates per-task-per-bucket counts in ONE scan (map-side combined,
  * |tasks|·B-bounded shuffle), and descends each task into the bucket
  * containing its rank. Integer ranges shrink by a factor of B per round,
  * so round count is <= ceil(64 / log2(B)) = 6 at B = 4096 for ANY long
  * data — and each later round's scan carries pushed-down range
  * predicates, so parquet row-group stats prune most of the input after
  * round one.
  *
  * Exactness: values are longs, buckets are exact integer arithmetic
  * (TRUE `div` — a double `/` would mis-bucket once a span exceeds 2^53),
  * and a task ends when its candidate range is a single value — ties need
  * no breaking because an order statistic is a VALUE, and every tied row
  * holds it. No floats anywhere ⇒ bit-identical to any SQL engine's rank
  * replay. Ranges spanning more than half the long domain (lo < 0 <= hi
  * with hi - lo overflowing) are sign-split in their round instead of
  * bucketed.
  *
  * Driver state per round is one B-entry histogram per active task plus
  * the per-group bounds row (declared bounded collects — the
  * codebook/offset-table pattern of `corpus_global_order` and
  * `Search.bm25TopK`); the caller contract is a BOUNDED group count (the
  * funnel's steps, a dashboard's segments), while each group's row
  * population is unbounded.
  */
object ExactQuantiles {

  private case class Task(id: Int, g: String, lo: Long, hi: Long, rank: Long)

  /** Value at each requested 1-based rank of each group of `df`, where a
    * group's order is its `valueCol` longs ascending. One scan per
    * bisection round TOTAL (all groups and ranks advance together).
    *
    * @param ranksByGroup 1-based target ranks per group key (group keys
    *                     compared as strings); every listed group must be
    *                     present and every rank within [1, group count]
    * @return value at each (group, rank)
    */
  def longRanksGrouped(df: DataFrame, groupCol: String, valueCol: String,
                       ranksByGroup: Map[String, Seq[Long]],
                       buckets: Int = 4096): Map[(String, Long), Long] = {
    require(ranksByGroup.nonEmpty && ranksByGroup.values.forall(_.nonEmpty),
      "no ranks requested")
    val (slim, bounds) = slimAndBounds(df, groupCol, valueCol)
    ranksByGroup.foreach { case (grp, ranks) =>
      val (_, _, n) = bounds.getOrElse(grp,
        throw new IllegalArgumentException(s"group '$grp' has no rows"))
      ranks.foreach(r => require(r >= 1 && r <= n,
        s"rank $r out of range [1, $n] for group '$grp'"))
    }
    search(slim, bounds, ranksByGroup, buckets)
  }

  /** The (group, value) projection plus one (lo, hi, n) aggregate over it —
    * the single pre-pass every entry point shares (the grouped quantile
    * path used to pay this aggregate twice: once for counts, once for
    * bounds).
    */
  private def slimAndBounds(df: DataFrame, groupCol: String,
                            valueCol: String)
      : (DataFrame, Map[String, (Long, Long, Long)]) = {
    val g = col(groupCol).cast("string")
    val v = col(valueCol).cast("long")
    val slim = df.select(g.as("_g"), v.as("_v")).na.drop()
    val bounds = slim.groupBy(col("_g"))
      .agg(min(col("_v")).as("lo"), max(col("_v")).as("hi"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    (slim, bounds)
  }

  private def search(slim: DataFrame,
                     bounds: Map[String, (Long, Long, Long)],
                     ranksByGroup: Map[String, Seq[Long]],
                     buckets: Int): Map[(String, Long), Long] = {
    val spark = slim.sparkSession
    import spark.implicits._

    val resolved = scala.collection.mutable.Map.empty[(String, Long), Long]
    var nextId = 0
    var active: List[(Task, Long)] = // task + the ORIGINAL rank it serves
      ranksByGroup.toList.flatMap { case (grp, ranks) =>
        val (lo, hi, _) = bounds(grp)
        ranks.distinct.map { r =>
          nextId += 1
          (Task(nextId, grp, lo, hi, r), r)
        }
      }

    while (active.nonEmpty) {
      // immediately-resolvable tasks don't need a scan
      val (done, open) = active.partition { case (t, _) => t.lo == t.hi }
      done.foreach { case (t, r0) => resolved((t.g, r0)) = t.lo }
      active = open
      if (active.nonEmpty) {
        val ranges = active.map { case (t, _) =>
          val signSplit = t.lo < 0 && t.hi - t.lo < 0
          val span = if (signSplit) 0L else t.hi - t.lo
          (t.id, t.g, t.lo, t.hi, span / buckets + 1, signSplit)
        }.toDF("_tid", "_tg", "_lo", "_hi", "_width", "_sign")
        // broadcast the bounded task table; a row joins EVERY task whose
        // range holds it (p50/p90 of one group share round-1 rows)
        val hist = slim
          .join(broadcast(ranges),
            col("_g") === col("_tg") &&
              col("_v") >= col("_lo") && col("_v") <= col("_hi"))
          .groupBy(col("_tid"),
            expr("CASE WHEN _sign THEN (CASE WHEN _v < 0 THEN 0L ELSE 1L END)" +
              " ELSE ((_v - _lo) div _width) END").as("_b"))
          .agg(count(lit(1)).as("_c"))
          .collect()
          .groupBy(_.getInt(0))
          .map { case (tid, rows: Array[Row]) =>
            tid -> rows.map(r => r.getLong(1) -> r.getLong(2)).toMap }
        active = active.map { case (t, r0) =>
          val h = hist.getOrElse(t.id, Map.empty[Long, Long])
          if (t.lo < 0 && t.hi - t.lo < 0) {
            // sign-split round: bucket 0 = negatives, bucket 1 = rest
            val nNeg = h.getOrElse(0L, 0L)
            if (t.rank <= nNeg) (t.copy(lo = t.lo, hi = -1L), r0)
            else (t.copy(lo = 0L, hi = t.hi, rank = t.rank - nNeg), r0)
          } else {
            val width = (t.hi - t.lo) / buckets + 1
            var remaining = t.rank
            var b = 0L
            while (remaining > h.getOrElse(b, 0L)) {
              remaining -= h.getOrElse(b, 0L)
              b += 1
              require(b <= (t.hi - t.lo) / width,
                s"rank walked off histogram (task=$t)")
            }
            val blo = t.lo + b * width
            val bhi = math.min(t.hi, blo + width - 1)
            (t.copy(lo = blo, hi = bhi, rank = remaining), r0)
          }
        }
      }
    }
    resolved.toMap
  }

  /** Single-population form: value at each 1-based rank of `df` ordered by
    * long `valueCol` (delegates to the grouped search with one group).
    */
  def longRanks(df: DataFrame, valueCol: String, ranks: Seq[Long],
                buckets: Int = 4096): Seq[Long] = {
    require(ranks.nonEmpty, "no ranks requested")
    val one = df.select(lit("g").as("_all"), col(valueCol))
    val m = longRanksGrouped(one, "_all", valueCol,
      Map("g" -> ranks), buckets)
    ranks.map(r => m(("g", r)))
  }

  /** Lower quantiles per group in one grouped search: for each group and
    * each (label, qNum, qDen) quantile, the value at rank
    * max(1, ceil(q*n)) of that group. Returns (group, label) ->
    * (n, rank, value); groups with zero rows are absent.
    */
  def lowerQuantilesGrouped(df: DataFrame, groupCol: String,
                            valueCol: String,
                            quantiles: Seq[(String, Long, Long)],
                            buckets: Int = 4096)
      : Map[(String, String), (Long, Long, Long)] = {
    // one shared (slim, bounds) pre-pass: group sizes for the rank
    // arithmetic come from the same aggregate that seeds the search
    val (slim, bounds) = slimAndBounds(df, groupCol, valueCol)
    val ranksByGroup = bounds.map { case (grp, (_, _, n)) =>
      grp -> quantiles.map { case (_, qn, qd) => lowerQuantileRank(n, qn, qd) }
    }
    if (ranksByGroup.isEmpty) return Map.empty
    val values = search(slim, bounds, ranksByGroup, buckets)
    (for {
      (grp, (_, _, n)) <- bounds.toSeq
      (label, qn, qd) <- quantiles
      r = lowerQuantileRank(n, qn, qd)
    } yield (grp, label) -> ((n, r, values((grp, r))))).toMap
  }

  /** Lower-quantile ranks for a group of size n: rank(q) = max(1, ceil(q*n))
    * computed in exact integer arithmetic ((q_num * n + q_den - 1) / q_den).
    */
  def lowerQuantileRank(n: Long, qNum: Long, qDen: Long): Long =
    math.max(1L, (qNum * n + qDen - 1) / qDen)
}
