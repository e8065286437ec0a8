package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics operators over an event stream: ordered funnels,
  * cohort retention, robust (median/MAD) anomaly flags, and first-order
  * event-type transitions. These are the query shapes the reference's
  * event tables feed downstream dashboards with; re-expressed as
  * declarative Spark plans.
  *
  * Determinism contract (shared with the rest of the engine): every
  * numeric output is an exact integer/decimal aggregate or a single IEEE
  * division of two exact values — no order-dependent double sums, no
  * interpolated percentiles. "Median" here is the LOWER median (element at
  * rank ceil(n/2) of the sorted group), which is rank-arithmetic on exact
  * values and replayable bit-for-bit by any SQL engine.
  *
  * Scale shape (100 TB): every operator below shuffles only on its natural
  * key (user for funnels/retention/transitions, series key for anomalies)
  * and aggregates map-side first. No global windows, no driver collects;
  * per-key window sorts are bounded by a single key's history, and the
  * anomaly windows by the calendar span of one series.
  */
object EventAnalytics {

  /** Ordered conversion funnel. A user "reaches" step k if an event
    * matching step k's predicate occurs STRICTLY AFTER the user's earliest
    * qualifying step-(k-1) event (earliest-qualifying semantics, the
    * standard product-analytics definition).
    *
    * Plan: one filtered min-aggregate per step, chained by an equi-join on
    * the user key — k steps cost k bounded hash-aggs + (k-1) user-keyed
    * joins, all reusing the same hash partitioning (AQE coalesces). No
    * per-user sequence materialization, so a power user with 10^6 events
    * costs the same as one with 10.
    *
    * @param events  event rows
    * @param userCol user/entity key column name
    * @param ordCol  monotone event-order column (e.g. epoch micros)
    * @param steps   ordered (stepName, predicate) pairs, size >= 1
    * @return one row per step: (step BIGINT 1-based, step_name, n_users
    *         BIGINT, conv_rate DOUBLE = n_users / step-1 users)
    */
  def funnel(events: DataFrame, userCol: String, ordCol: String,
             steps: Seq[(String, Column)]): DataFrame = {
    // One global aggregate counts non-null first-ords per step straight
    // off the per-user rows into a single |steps|-wide row (map-side
    // partials, one tiny shuffle), then explode unpivots it.
    val aggs = steps.indices.map(i =>
      count(col(s"_f${i + 1}")).as(s"_s${i + 1}"))
    val row = perUserFirstOrds(events, userCol, ordCol, steps)
      .agg(aggs.head, aggs.tail: _*)
    val entries = steps.zipWithIndex.map { case ((name, _), i) =>
      struct(
        lit((i + 1).toLong).as("step"), lit(name).as("step_name"),
        col(s"_s${i + 1}").as("n_users"),
        (col(s"_s${i + 1}").cast("double") / col("_s1").cast("double"))
          .as("conv_rate"))
    }
    row.select(explode(array(entries: _*)).as("r")).select("r.*")
  }

  /** Same funnel, fully distributed (no driver-side counts): returns the
    * per-step user sets unioned with a step tag, so callers can aggregate
    * or join further without materializing counts on the driver.
    */
  def funnelUsers(events: DataFrame, userCol: String, ordCol: String,
                  steps: Seq[(String, Column)]): DataFrame = {
    val fs = steps.indices.map(i => s"_f${i + 1}")
    val reachStructs = steps.zipWithIndex.map { case ((name, _), i) =>
      struct(lit((i + 1).toLong).as("step"), lit(name).as("step_name"),
        col(s"_f${i + 1}").as("first_ord"))
    }
    perUserFirstOrds(events, userCol, ordCol, steps)
      .select(col(userCol), explode(array(reachStructs: _*)).as("r"))
      .select(col("r.step"), col("r.step_name"), col(userCol),
        col("r.first_ord"))
      .filter(col("first_ord").isNotNull)
  }

  /** One row per user with `_f1.._fk` = the first-qualifying ord at each
    * step (NULL once the chain breaks) — the single-pass core every funnel
    * shape derives from.
    *
    * Plan: one slim projection (user, ord, one pre-evaluated boolean per
    * step), ONE user-key shuffle, then k CASCADED window min-aggs over the
    * same user partitioning — `_fk` references `_f(k-1)` inside its
    * predicate, so Catalyst stacks k Window operators but inserts exactly
    * one Exchange+Sort (each later window's requirement is already
    * satisfied). A per-user groupBy (no further Exchange — the window
    * output is already hash-partitioned on user) collapses to one row per
    * user. Versus the previous chained agg+join formulation (k hash-aggs +
    * k-1 user-keyed joins + a multiply-referenced projection needing a
    * cache/checkpoint lifecycle) this is one shuffle instead of 2k-1, a
    * single-reference plan (nothing to cache, nothing to leak — the
    * round-8 cache-vs-checkpoint regression dissolves), and ~4x fewer
    * sequential stages of per-job overhead at bench scale. The window
    * buffers one user's qualifying events (spillable) — bounded by a
    * single key's history, the same contract as [[transitions]].
    */
  private def perUserFirstOrds(events: DataFrame, userCol: String,
                               ordCol: String,
                               steps: Seq[(String, Column)]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val anyStep = steps.map(_._2).reduce(_ || _)
    val base = events.filter(anyStep).select(
      col(userCol) +: col(ordCol) +:
        steps.zipWithIndex.map { case ((_, p), i) => p.as(s"_p${i + 1}") }: _*)
    val w = Window.partitionBy(col(userCol))
    var cur = base.withColumn("_f1",
      min(when(col("_p1"), col(ordCol))).over(w))
    for (i <- 2 to steps.size)
      cur = cur.withColumn(s"_f$i",
        min(when(col(s"_p$i") && col(ordCol) > col(s"_f${i - 1}"),
          col(ordCol))).over(w))
    val fs = steps.indices.map(i => s"_f${i + 1}")
    // all _fi are per-user constants; min() just picks the constant
    cur.groupBy(col(userCol))
      .agg(min(col(fs.head)).as(fs.head),
        fs.tail.map(f => min(col(f)).as(f)): _*)
  }

  /** Per-user step-to-step conversion latency: for every user who reached
    * step k >= 2, `latency` = first-qualifying ord at step k minus the
    * first-qualifying ord at step k-1. One extra user-key equi-join over
    * the (already user-keyed) reach sets.
    *
    * @return (step BIGINT >= 2, step_name, user, latency)
    */
  def funnelLatencies(events: DataFrame, userCol: String, ordCol: String,
                      steps: Seq[(String, Column)]): DataFrame = {
    require(steps.size >= 2, "latency needs at least two steps")
    // consecutive first-ords live in the SAME per-user row, so latency is
    // a plain column difference — no reach-set self-join
    val latStructs = (2 to steps.size).map { k =>
      struct(lit(k.toLong).as("step"), lit(steps(k - 1)._1).as("step_name"),
        (col(s"_f$k") - col(s"_f${k - 1}")).as("latency"))
    }
    perUserFirstOrds(events, userCol, ordCol, steps)
      .select(col(userCol), explode(array(latStructs: _*)).as("r"))
      .select(col("r.step"), col("r.step_name"), col(userCol),
        col("r.latency"))
      .filter(col("latency").isNotNull)
  }

  /** Cohort retention. Each user's cohort is the bucket of their FIRST
    * event; the operator counts, for every (cohort, offset) pair, the
    * distinct users from that cohort active exactly `offset` buckets
    * later (offset 0 = the cohort bucket itself).
    *
    * Plan: per-user min-window (cohort — one user-keyed shuffle, no
    * order-by sort key beyond the partition key), distinct on (cohort,
    * offset, user), then a count agg on the bounded (cohort, offset) grid.
    *
    * @param bucketCol long bucket column (e.g. epoch-day / 7 for weeks)
    * @return (cohort BIGINT, offset BIGINT, n_users BIGINT)
    */
  def retention(events: DataFrame, userCol: String,
                bucketCol: String): DataFrame = {
    // cohort = per-user min bucket as a WINDOW over the user partition
    // (r17): the agg-then-join-back formulation scanned the events twice
    // and paid a user-keyed join; the window computes the same per-user
    // constant in the single user-partitioned pass (no ORDER BY ⇒ no
    // per-user sort — an unbounded-frame min). One scan, and the join
    // Exchange is gone.
    val byUser = Window.partitionBy(col(userCol))
    events.select(col(userCol), col(bucketCol))
      .withColumn("cohort", min(col(bucketCol)).over(byUser))
      .select(col("cohort"),
        (col(bucketCol) - col("cohort")).as("offset"), col(userCol))
      .distinct()
      .groupBy(col("cohort"), col("offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Robust per-series anomaly flags on a pre-bucketed series.
    *
    * For each series (keyCols) the operator computes the LOWER median of
    * `valueCol` and the lower median of absolute deviations (MAD), then
    * flags rows with |x - med| > k * MAD. Lower-median = the value at
    * 1-based rank ceil(n/2) when the group is sorted by (value, tiebreak
    * columns) — exact rank arithmetic, no interpolation, so any SQL engine
    * replays it bit-for-bit. With MAD = 0 (constant series) only exact
    * departures from the median are flagged (k * 0 = 0).
    *
    * Groups are one series' calendar buckets — bounded by time span, not
    * data volume, so the per-key window sort is safe at any corpus size.
    *
    * @param buckets  one row per (series, bucket) with an EXACT numeric
    *                 `valueCol` (integer or decimal — never a raw double
    *                 sum)
    * @param ordCol   unique-per-series tiebreak column (e.g. the bucket)
    * @return input columns + (med, mad, is_anomaly BOOLEAN)
    */
  def robustAnomalies(buckets: DataFrame, keyCols: Seq[String],
                      valueCol: String, ordCol: String,
                      k: Int = 3): DataFrame = {
    val keys = keyCols.map(col)
    val byValue = Window.partitionBy(keys: _*)
      .orderBy(col(valueCol), col(ordCol))
    val grp = Window.partitionBy(keys: _*)
    // lower median of the values
    val ranked = buckets
      .withColumn("_rn", row_number().over(byValue))
      .withColumn("_n", count(lit(1)).over(grp))
      .withColumn("_med_src",
        when(col("_rn") === ((col("_n") + 1) / 2).cast("int"),
          col(valueCol)))
      .withColumn("med", max(col("_med_src")).over(grp))
    // lower median of |x - med|
    val dev = ranked.withColumn("_dev", abs(col(valueCol) - col("med")))
    val byDev = Window.partitionBy(keys: _*)
      .orderBy(col("_dev"), col(ordCol))
    dev
      .withColumn("_dn", row_number().over(byDev))
      .withColumn("_mad_src",
        when(col("_dn") === ((col("_n") + 1) / 2).cast("int"), col("_dev")))
      .withColumn("mad", max(col("_mad_src")).over(grp))
      .withColumn("is_anomaly", col("_dev") > lit(k) * col("mad"))
      .drop("_rn", "_n", "_med_src", "_dev", "_dn", "_mad_src")
  }

  /** First-order transition matrix between consecutive event types within
    * each user's ordered stream: counts and exact-ratio probabilities.
    *
    * Plan: one per-user lag window (bounded by a user's history), a count
    * agg on the (from, to) grid — bounded by |types|^2 — and a windowed
    * sum over that bounded grid for the denominator.
    *
    * @return (from_type, to_type, n BIGINT, p DOUBLE = n / sum_n(from))
    */
  def transitions(events: DataFrame, userCol: String, typeCol: String,
                  ordCols: Seq[Column]): DataFrame = {
    val seqW = Window.partitionBy(col(userCol)).orderBy(ordCols: _*)
    val pairs = events
      .withColumn("_from", lag(col(typeCol), 1).over(seqW))
      .filter(col("_from").isNotNull)
      .select(col("_from").as("from_type"), col(typeCol).as("to_type"))
    val counts = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val fromW = Window.partitionBy(col("from_type"))
    counts.withColumn("p",
      col("n").cast("double") / sum(col("n")).over(fromW).cast("double"))
  }
}
