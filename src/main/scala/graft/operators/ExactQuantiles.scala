package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  * data. The rounds all scan the same 2-column (group, value) projection,
  * which is persisted MEMORY_AND_DISK for the search's duration (the
  * range predicates are join conditions against the task table, not
  * literals, so they can never reach the file scan as pushed-down
  * filters) — source parquet is read and decoded exactly once, and at
  * scale the slim projection spills to local disk rather than evicting.
  *
  * Exactness: values are longs, buckets are exact integer arithmetic
  * (TRUE `div` — a double `/` would mis-bucket once a span exceeds 2^53),
  * and a task ends when its candidate range is a single value — ties need
  * no breaking because an order statistic is a VALUE, and every tied row
  * holds it. No floats anywhere ⇒ bit-identical to any SQL engine's rank
  * replay. Ranges spanning more than half the long domain (lo < 0 <= hi
  * with hi - lo overflowing; tested overflow-free as hi > MaxValue + lo
  * because ANSI arithmetic would throw on the wrap) are sign-split in
  * their round instead of bucketed.
  *
  * Scale shape: the task table is a DATAFRAME, not driver state — group
  * bounds, per-round histograms, and the bucket-descent all stay
  * distributed (histogram → windowed cumulative sum per task → joined
  * bounds update), so group cardinality never has to fit on the driver.
  * The round count is computed EXACTLY upfront from the widest seed span
  * (range size shrinks as ceil(N/B^k) — an integer identity, not an
  * estimate), resolved tasks are fixed points of the round transform, and
  * round frames go through [[Lineage.cut]] so round k never replays
  * rounds 1..k-1 — so the whole descent chains lazily into ONE
  * materializing job whose exit count doubles as the conservation guard
  * (the driver sees one (span, count) row and one final 2-long row, with
  * no per-round round-trip). Only the Map-returning convenience entry
  * points collect the final (group, rank) → value result — bounded by the
  * caller's own requested-output size, which a Map return IS.
  */
object ExactQuantiles {

  /** Probe: the most recent search's computed round budget (the exact
    * ceil(N/B^k) descent count derived from the widest seed span — see
    * [[roundsFor]]). Read by the scale rehearsal to back the "round count
    * is data-size-independent (span-driven, <= ceil(64/log2 B) + 1)"
    * claim with a value at 1x vs 10x — not part of the API.
    */
  private[graft] var lastRounds: Int = 0

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
    val spark = df.sparkSession
    import spark.implicits._
    // the bisection re-reads this projection every round (bounds pass +
    // <= ceil(64/log2 B) descent rounds), so it rides in the block store
    // for the search's duration — at scale the 2-column slim is a small
    // fraction of its source and MEMORY_AND_DISK spills rather than
    // evicts. Both collects below are eager, so release-on-exit is safe.
    // Skipped when the caller already cached the input (servedFromCache):
    // the rounds then read the caller's blocks directly.
    val slim0 = slimmed(df, groupCol, valueCol)
    val ownCache = !servedFromCache(slim0)
    val slim =
      if (ownCache)
        slim0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else slim0
    try {
      // the requested-group bounds ARE driver-bounded here (they validate a
      // driver-provided Map); the general unbounded-group path is
      // lowerQuantilesGroupedDF, which never collects bounds
      val requested = ranksByGroup.keySet.toSeq
      val bounds = slim.filter(col("_g").isin(requested: _*))
        .groupBy(col("_g"))
        .agg(min(col("_v")).as("lo"), max(col("_v")).as("hi"),
          count(lit(1)).as("n"))
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      val seeds = ranksByGroup.toSeq.flatMap { case (grp, ranks) =>
        val (lo, hi, n) = bounds.getOrElse(grp,
          throw new IllegalArgumentException(s"group '$grp' has no rows"))
        ranks.foreach(r => require(r >= 1 && r <= n,
          s"rank $r out of range [1, $n] for group '$grp'"))
        ranks.distinct.map(r => (grp, r, lo, hi, r))
      }.toDF("_tg", "_r0", "_lo", "_hi", "_rank")
      searchTasks(slim, seeds, buckets)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap
    } finally if (ownCache) slim.unpersist(blocking = false)
  }

  /** The (group, value) projection every entry point shares. */
  private def slimmed(df: DataFrame, groupCol: String,
                      valueCol: String): DataFrame =
    df.select(col(groupCol).cast("string").as("_g"),
      col(valueCol).cast("long").as("_v")).na.drop()

  /** True when the slim projection already reads a caller-owned cache: the
    * optimized plan is projections/filters directly over an
    * `InMemoryRelation`, so every bisection round is served from the block
    * store as-is. The operator's own persist + eager exit cut then buys
    * nothing and costs a duplicate materialization plus a checkpoint job —
    * measured as the whole 1.43x events_funnel_latency regression at sf0.1
    * (the query caches its latency frame itself). The persist-for-iteration
    * win only exists when the rounds would otherwise re-run uncached
    * upstream work, so a cache buried under heavier operators (a join, an
    * aggregate) does NOT disable the persist — only a top-of-plan one.
    */
  private[operators] def servedFromCache(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    @annotation.tailrec
    def top(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
      p match {
        case _: InMemoryRelation => true
        case f: Filter => top(f.child)
        case pr: Project => top(pr.child)
        case _ => false
      }
    top(df.queryExecution.optimizedPlan)
  }

  /** Exact round budget for a value span: the smallest k with
    * ceil^k(N/B) = 1 where N = span+1 (range SIZE), computed in exact
    * integer arithmetic — ceil(ceil(x/a)/b) = ceil(x/(ab)) for integers,
    * so N_k = ceil(N0/B^k) exactly and k = ceil(log_B N0), but a floating
    * log at a B^k boundary can undershoot by one, so iterate instead.
    */
  private[operators] def roundsFor(span: BigInt, buckets: Int): Int = {
    var n = span + 1
    var k = 0
    while (n > 1) { n = (n + buckets - 1) / buckets; k += 1 }
    k
  }

  /** Run `f` with AQE disabled on this session, restoring the previous
    * setting after. The bisection's shuffle shapes are KNOWN at plan time
    * (tasks ≤ groups·quantiles rows, histograms ≤ tasks·B rows, every
    * round the same), so adaptive per-stage re-planning has nothing to
    * discover here and costs real wall time on a scheduling-bound search:
    * measured 23 jobs / 2.8 s -> 8 jobs / 1.7 s on the sf0.1 funnel-latency
    * search at local[32]. Each round's physical plan is fixed when its
    * lineage cut materializes the plan to an RDD, which happens inside
    * this scope; the caller's later actions on the RESULT frame plan with
    * whatever the session normally uses.
    *
    * CONCURRENCY CONTRACT: the toggle mutates the SHARED session conf for
    * the duration of the search, so a query planned concurrently on the
    * same SparkSession would plan with AQE off, and two concurrent
    * searches could clobber each other's restore. Callers running
    * quantile searches concurrently with other work must hand this
    * operator its own `spark.newSession()` (cheap: shares the
    * SparkContext and cached data, isolates the conf) — the bench and
    * oracle drivers are single-query-at-a-time, so they share safely.
    */
  private def withStaticPlan[T](spark: org.apache.spark.sql.SparkSession)
                               (f: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** The distributed bisection core: advances a task table
    * (_tg, _r0, _lo, _hi, _rank) against `slim` (_g, _v) until every
    * task's range is a single value. Returns (_tg, _r0, _value).
    *
    * Each round is one scan of `slim` joined to the tasks (Spark picks
    * broadcast vs shuffle by the task table's size — never forced,
    * because at 10^7 groups a forced broadcast is the OOM this operator
    * exists to avoid), one |tasks|·B-bounded histogram aggregate, a
    * per-task cumulative-sum window over at most B bucket rows, and an
    * integer bounds update.
    *
    * The round COUNT is not discovered by probing — it is computed exactly
    * upfront from the widest seed span (range size shrinks as
    * ceil(N/B^k), an integer identity, so k* = [[roundsFor]] rounds
    * suffice for every task; a wrapped range pays one sign-split round
    * first). A RESOLVED task (lo == hi) is a FIXED POINT of the round
    * transform — its single-value range re-buckets to itself — so early
    * finishers ride the remaining rounds unchanged and no per-round
    * doneness probe is needed. That turns the whole search into ONE lazy
    * plan chain (per-round lineage cuts keep the logical plan O(1)-deep)
    * materialized by a single job, instead of a driver action per round:
    * measured 26 -> ~8 Spark jobs on the funnel-latency query, whose cost
    * was round-trip scheduling, not data. The sole driver-side values are
    * the upfront (span, count) row and the final conservation counts —
    * a task whose rank walks off its histogram (inconsistent seed)
    * VANISHES in that round, so the exit check `total == seeded` is the
    * same guard the per-round probe used to run.
    */
  private def searchTasks(slim: DataFrame, seeds: DataFrame,
                          buckets: Int): DataFrame =
    withStaticPlan(slim.sparkSession) { searchTasksStatic(slim, seeds, buckets) }

  private def searchTasksStatic(slim: DataFrame, seeds: DataFrame,
                                buckets: Int): DataFrame = {
    val done = col("_lo") === col("_hi")
    // overflow-free "hi - lo wraps" test: lo < 0 && hi > MaxValue + lo
    // (ANSI arithmetic would throw on the naive subtraction)
    val wraps = col("_lo") < 0 && col("_hi") > lit(Long.MaxValue) + col("_lo")
    val seeded = Lineage.cut(seeds)
    val spanRow = seeded.agg(count(lit(1)).as("n"),
      max(when(wraps, lit(Long.MaxValue))
        .otherwise(col("_hi") - col("_lo"))).as("span"),
      max(when(wraps, 1L).otherwise(0L)).as("anyWrap")).head()
    val nSeeded = spanRow.getLong(0)
    if (nSeeded == 0L) {
      lastRounds = 0
      return seeded.select(col("_tg"), col("_r0"), col("_lo").as("_value"))
    }
    val rounds =
      if (spanRow.getLong(2) == 1L)
        // sign-split round + full-half descent: each half spans < 2^63
        1 + roundsFor(BigInt(2).pow(63) - 1, buckets)
      else roundsFor(BigInt(spanRow.getLong(1)), buckets)
    var tasks = seeded
    var r = 0
    while (r < rounds) {
      r += 1
      val ranges0 = tasks.withColumn("_sign", wraps)
        .withColumn("_width",
          when(col("_sign"), lit(1L))
            .otherwise(expr(s"(_hi - _lo) div ${buckets}L + 1L")))
      // the join strategy is PINNED from the exact task count (the plan
      // runs statically — see withStaticPlan — and a checkpointed task
      // table has no stats, so the planner alone would shuffle-join even
      // 2 tasks, hashing the whole corpus onto as many partitions as
      // there are GROUPS: one group = one hot partition on the
      // global-median shape). Small task tables broadcast — the corpus
      // never moves; past the broadcast budget the task table is
      // group-sized and a shuffle by group key is exactly right.
      val ranges =
        if (nSeeded <= 200000L) broadcast(ranges0)
        else ranges0.hint("shuffle_hash")
      val b: Column =
        when(col("_sign"), when(col("_v") < 0, 0L).otherwise(1L))
          .otherwise(expr("(_v - _lo) div _width"))
      val hist = slim
        .join(ranges, col("_g") === col("_tg") &&
          col("_v") >= col("_lo") && col("_v") <= col("_hi"))
        // _lo/_hi/_rank/_sign/_width are functionally dependent on
        // (_tg, _r0) — riding them as grouping keys keeps them on the
        // histogram rows without a second join
        .groupBy(col("_tg"), col("_r0"), col("_lo"), col("_hi"),
          col("_rank"), col("_sign"), col("_width"), b.as("_b"))
        .agg(count(lit(1)).as("_c"))
      val w = Window.partitionBy(col("_tg"), col("_r0")).orderBy(col("_b"))
      tasks = hist
        .withColumn("_cum", sum(col("_c")).over(w))
        // the task's bucket: first (only) one where the cumulative count
        // reaches its rank; empty buckets have no row and contribute 0
        .filter(col("_cum") - col("_c") < col("_rank") &&
          col("_rank") <= col("_cum"))
        .select(col("_tg"), col("_r0"),
          when(col("_sign") && col("_b") === 0, col("_lo"))
            .when(col("_sign") && col("_b") === 1, lit(0L))
            .otherwise(col("_lo") + col("_b") * col("_width")).as("_lo"),
          when(col("_sign") && col("_b") === 0, lit(-1L))
            .when(col("_sign") && col("_b") === 1, col("_hi"))
            // min(hi, blo + width - 1) phrased overflow-free: blo + width
            // can pass MaxValue when hi sits within one bucket of it, and
            // ANSI arithmetic throws on the wrap — subtract instead
            .when(col("_hi") - (col("_lo") + col("_b") * col("_width")) <=
              col("_width") - 1, col("_hi"))
            .otherwise(col("_lo") + col("_b") * col("_width") +
              col("_width") - 1)
            .as("_hi"),
          (col("_rank") - (col("_cum") - col("_c"))).as("_rank"))
      // lazy cut per round: keeps the LOGICAL plan O(1)-deep across any
      // round count (the buckets=4 stress setting runs 20+ rounds) — the
      // RDD chain behind the cuts still materializes in the single final
      // job below, block by block
      tasks = Lineage.cut(tasks)
    }
    lastRounds = rounds
    // the ONE materializing action of the whole search, doubling as the
    // conservation check: a task vanishes only when its rank walked off
    // its histogram (rank > group row count — an inconsistent seed), and
    // an unresolved task after the computed budget is a bug by the
    // ceil(N/B^k) identity
    val cnt = tasks.agg(sum(when(done, 1L).otherwise(0L)).as("d"),
      count(lit(1)).as("t")).head()
    val nTotal = if (cnt.isNullAt(1)) 0L else cnt.getLong(1)
    val nDone = if (cnt.isNullAt(0)) 0L else cnt.getLong(0)
    require(nTotal == nSeeded,
      s"rank walked off histogram: $nSeeded tasks seeded, $nTotal resolved")
    require(nDone == nTotal,
      s"bisection incomplete after $rounds computed rounds (bug): " +
        s"$nDone/$nTotal done")
    tasks.select(col("_tg"), col("_r0"), col("_lo").as("_value"))
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

  /** Lower quantiles per group, fully distributed end to end — the entry
    * point for UNBOUNDED group cardinality: group bounds seed the task
    * table without ever touching the driver, so 10^7 groups cost a shuffle,
    * not a driver OOM. For each group and each (label, qNum, qDen)
    * quantile, the value at rank max(1, ceil(q*n)) of that group. Returns
    * (group, label, n, rnk, value); groups with zero rows are absent.
    */
  def lowerQuantilesGroupedDF(df: DataFrame, groupCol: String,
                              valueCol: String,
                              quantiles: Seq[(String, Long, Long)],
                              buckets: Int = 4096): DataFrame = {
    require(quantiles.nonEmpty, "no quantiles requested")
    // persisted for the search's duration: the bounds aggregate, every
    // descent round, and the final rank join all scan this projection —
    // without the cache each pass re-reads and re-decodes the source
    // (the per-round range predicates are JOIN conditions against the
    // task table, not literals, so nothing reaches the file scan as a
    // pushed-down filter). Released on the eager exit cut below. Skipped
    // entirely when the caller already cached the input (servedFromCache):
    // the rounds then read the caller's blocks, nothing of ours needs
    // releasing, and the exit cut's extra materialization job is dropped
    // too (the CacheHygiene invariant holds either way — the operator
    // leaves no cache entry of its own behind).
    val slim0 = slimmed(df, groupCol, valueCol)
    val ownCache = !servedFromCache(slim0)
    val slim =
      if (ownCache)
        slim0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else slim0
    // the quantile list rides as an exploded LITERAL array (a Generate in
    // the plan), not a cross join — a 1-row broadcast nested loop would be
    // harmless here but indistinguishable from a real one to a plan audit
    val qlit = array(quantiles.map { case (l, qn, qd) =>
      struct(lit(l).as("_ql"), lit(qn).as("_qn"), lit(qd).as("_qd")) }: _*)
    // one bounds aggregate seeds the search AND carries the group sizes
    // for the rank arithmetic — never collected
    val withRank = slim.groupBy(col("_g"))
      .agg(min(col("_v")).as("_blo"), max(col("_v")).as("_bhi"),
        count(lit(1)).as("_bn"))
      .select(col("*"), explode(qlit).as("_q"))
      .select(col("_g"), col("_blo"), col("_bhi"), col("_bn"),
        col("_q._ql").as("_ql"), col("_q._qn").as("_qn"),
        col("_q._qd").as("_qd"))
      .withColumn("_r0",
        greatest(lit(1L), expr("(_qn * _bn + _qd - 1) div _qd")))
    val seeds = withRank
      .select(col("_g").as("_tg"), col("_r0"), col("_blo").as("_lo"),
        col("_bhi").as("_hi"), col("_r0").as("_rank"))
      .distinct() // two quantiles of one group may share a rank
    // fresh aliases on the search output: `values` descends from `seeds`
    // which descends from `withRank`, so the raw _tg/_r0 attributes would
    // trip Spark's ambiguous-self-join detection in this re-join
    val values = searchTasks(slim, seeds, buckets)
      .select(col("_tg").as("_vg"), col("_r0").as("_vr"), col("_value"))
    val out = withRank
      .join(values, col("_g") === col("_vg") && col("_r0") === col("_vr"))
      .select(col("_g").as("group"), col("_ql").as("label"),
        col("_bn").as("n"), col("_r0").as("rnk"), col("_value").as("value"))
    // eager exit cut: the operator already runs actions internally (the
    // per-round conservation counts), so the frame was never caller-lazy —
    // materializing the O(groups x quantiles) result NOW lets the slim
    // cache be released without degrading the returned frame to a
    // recompute-from-source on the caller's first action. On the
    // caller-cached path there is no cache of ours to outlive, so the
    // result stays lazy over the caller's blocks.
    if (ownCache)
      try Lineage.cut(out, eager = true)
      finally slim.unpersist(blocking = false)
    else out
  }

  /** [[lowerQuantilesGroupedDF]] collected into a Map — the convenience
    * form for BOUNDED group counts (a funnel's steps, a dashboard's
    * segments); the Map return type is itself the bounded-output contract.
    * Returns (group, label) -> (n, rank, value).
    */
  def lowerQuantilesGrouped(df: DataFrame, groupCol: String,
                            valueCol: String,
                            quantiles: Seq[(String, Long, Long)],
                            buckets: Int = 4096)
      : Map[(String, String), (Long, Long, Long)] =
    lowerQuantilesGroupedDF(df, groupCol, valueCol, quantiles, buckets)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  /** Lower-quantile ranks for a group of size n: rank(q) = max(1, ceil(q*n))
    * computed in exact integer arithmetic ((q_num * n + q_den - 1) / q_den).
    */
  def lowerQuantileRank(n: Long, qNum: Long, qDen: Long): Long =
    math.max(1L, (qNum * n + qDen - 1) / qDen)
}
