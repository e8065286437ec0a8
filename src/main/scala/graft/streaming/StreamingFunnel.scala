package graft.streaming

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

/** Streaming conversion funnel: the incremental twin of
  * [[graft.operators.EventAnalytics.funnelUsers]], carrying each user's
  * earliest-qualifying step timestamps as keyed state across micro-batches
  * and emitting a (user, step, first_ord) row the moment a step is first
  * completed.
  *
  * Two delivery contracts, two entry points:
  *
  *   - [[reach]] — PROCESSING-ORDER fold. Monotonicity is the load-bearing
  *     property: under in-order processing a user's `first(k)` is SET ONCE
  *     and never revised — so the stream of emissions is exactly the batch
  *     operator's reach-set rows, with no retractions and no duplicate
  *     (user, step) pairs. Each micro-batch's events are sorted by ord
  *     inside the group before folding; ACROSS batches the source must
  *     deliver a user's events in ord order (the usual per-key ordering of
  *     a log-backed source — both graft DSv2 sources preserve it). An event
  *     arriving after a later-ord event of the same user has already been
  *     folded may under-count that user's progression — never over-count.
  *   - [[reachBuffered]] — WATERMARK-BUFFERED fold, for sources that can
  *     NOT guarantee per-key in-order delivery (multi-partition Kafka
  *     topics, retried producers). Events wait in keyed state until the
  *     event-time watermark passes them, then fold in ascending ord order —
  *     so any disorder bounded by the watermark delay is invisible and the
  *     emission stream equals the batch operator EXACTLY, not one-sidedly.
  *     Events later than the delay degrade to the same under-count-only
  *     contract as [[reach]].
  *
  * Tie semantics match batch exactly in both: a step-k event at the same
  * ord as the step-(k-1) completion is rejected (strictly-after), in any
  * fold order of the tied events.
  *
  * Scale: [[reach]] state is one long per funnel step regardless of event
  * volume; [[reachBuffered]] adds a buffer bounded by one user's events
  * per watermark-delay window (the price of reordering — at 100 TB set the
  * delay to the source's real disorder bound, not a safety fantasy).
  * Both run under RocksDB state via GraftSession's conf-gated provider.
  * State TTL: `idleTtl` (processing-time, [[reach]]) / `idleTtlMs`
  * (event-time, [[reachBuffered]]) drops a user's state after that much
  * inactivity — dropping state simply stops extending the user's funnel
  * (re-appearing users restart from step 1), the retention-policy knob
  * production deployments need to bound state size.
  */
object StreamingFunnel {

  /** A step first completed in this micro-batch. `step` is 1-based. */
  case class StepReached(user: Long, step: Int, first_ord: Long)

  /** Per-user earliest-qualifying ord per step; -1 = unreached. */
  case class FunnelState(firsts: Seq[Long])

  /** [[reachBuffered]] state: step ords + the not-yet-ripe event buffer +
    * the max event time seen (the TTL anchor).
    */
  case class BufferedFunnelState(firsts: Seq[Long], buf: Seq[(Long, Int)],
                                 lastSeen: Long)

  /** Fold `events` (ord, step) in ascending ord order into `firsts`
    * (mutated); returns the newly reached steps. The shared batch-parity
    * kernel of both entry points.
    */
  private def fold(user: Long, firsts: Array[Long],
                   events: Seq[(Long, Int)]): Seq[StepReached] = {
    val nSteps = firsts.length
    val out = scala.collection.mutable.ArrayBuffer.empty[StepReached]
    // ascending ord fold == the batch chained-min semantics; ties in
    // ord resolve identically in any order (strictly-after rejects)
    events.sortBy(_._1).foreach { case (ord, s) =>
      if (s >= 0 && s < nSteps && firsts(s) == -1L &&
          (s == 0 || (firsts(s - 1) != -1L && ord > firsts(s - 1)))) {
        firsts(s) = ord
        out += StepReached(user, s + 1, ord)
      }
    }
    out.toSeq
  }

  /** `rows`: a streaming DataFrame with long `userCol`, long `ordCol` and
    * int `stepCol` (0-based step index, pre-matched upstream — step
    * predicates are plain Column logic, e.g. a `when` chain over
    * event_type). Emits one [[StepReached]] per (user, step) ever, in
    * Update mode. `idleTtl` (e.g. "30 minutes"): drop a user's state after
    * that much processing-time inactivity. Caveat: enabling
    * ProcessingTimeTimeout makes Spark schedule no-data micro-batches
    * continuously (timers may expire at any moment) — pair it with a real
    * trigger interval; for a deterministic, replay-stable TTL prefer
    * [[reachBuffered]]'s event-time `idleTtlMs`.
    */
  def reach(rows: DataFrame, userCol: String, ordCol: String,
            stepCol: String, nSteps: Int,
            idleTtl: Option[String] = None): Dataset[StepReached] = {
    require(nSteps >= 1, "funnel needs at least one step")
    implicit val inEnc = ExpressionEncoder[(Long, Long, Int)]()
    implicit val stEnc = ExpressionEncoder[FunnelState]()
    implicit val outEnc = ExpressionEncoder[StepReached]()
    implicit val keyEnc = ExpressionEncoder[Long]()
    val timeout = if (idleTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
                  else GroupStateTimeout.NoTimeout
    rows
      .select(col(userCol).cast("long").as("u"),
        col(ordCol).cast("long").as("o"), col(stepCol).cast("int").as("s"))
      .na.drop(Seq("u", "o", "s"))
      .as[(Long, Long, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, timeout) {
        (user: Long, batch: Iterator[(Long, Long, Int)],
         state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            // TTL expiry: the user went idle past the retention window —
            // forget their progression (an abandoned funnel); if they
            // return they restart from step 1
            state.remove()
            Iterator.empty
          } else {
            val firsts = state.getOption
              .map(_.firsts.toArray)
              .getOrElse(Array.fill(nSteps)(-1L))
            val out = fold(user, firsts, batch.map(e => (e._2, e._3)).toSeq)
            if (out.nonEmpty) state.update(FunnelState(firsts.toSeq))
            // the timeout clock resets on every invocation for the key
            idleTtl.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }

  /** Out-of-order-safe funnel: `ordCol` is EPOCH MILLIS event time; events
    * buffer in keyed state until the watermark (configured by `delay`,
    * e.g. "10 seconds") passes them, then fold in ascending ord order.
    * Disorder within `delay` is invisible — emissions equal the batch
    * operator exactly; `idleTtlMs` drops a user's state once the watermark
    * runs `idleTtlMs` past their last event (event-time TTL — deterministic,
    * replay-stable, unlike a wall-clock TTL).
    */
  def reachBuffered(rows: DataFrame, userCol: String, ordCol: String,
                    stepCol: String, nSteps: Int, delay: String,
                    idleTtlMs: Option[Long] = None): Dataset[StepReached] = {
    require(nSteps >= 1, "funnel needs at least one step")
    implicit val inEnc = ExpressionEncoder[(Long, Long, Int, java.sql.Timestamp)]()
    implicit val stEnc = ExpressionEncoder[BufferedFunnelState]()
    implicit val outEnc = ExpressionEncoder[StepReached]()
    implicit val keyEnc = ExpressionEncoder[Long]()
    rows
      .select(col(userCol).cast("long").as("u"),
        col(ordCol).cast("long").as("o"), col(stepCol).cast("int").as("s"))
      .na.drop(Seq("u", "o", "s"))
      .withColumn("_ts", timestamp_millis(col("o")))
      .withWatermark("_ts", delay)
      // _ts rides along: the analyzer requires the watermarked column in
      // the fMGWS input to accept an event-time timeout
      .as[(Long, Long, Int, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
          GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[(Long, Long, Int, java.sql.Timestamp)],
         state: GroupState[BufferedFunnelState]) =>
          val st = state.getOption.getOrElse(
            BufferedFunnelState(Seq.fill(nSteps)(-1L), Nil, Long.MinValue))
          val firsts = st.firsts.toArray
          val arrived = batch.map(e => (e._2, e._3)).toSeq
          val buf = st.buf ++ arrived
          val lastSeen = (st.lastSeen +: arrived.map(_._1)).max
          val wm = state.getCurrentWatermarkMs()
          // ripe = watermark-closed: every event at or below wm has arrived
          // (if its disorder was within `delay`), so folding ripe events in
          // ord order IS the batch fold
          val (ripe, rest) = buf.partition(_._1 <= wm)
          val out = fold(user, firsts, ripe)
          val ttlDeadline = idleTtlMs.map(t => lastSeen + t)
          if (rest.isEmpty && ttlDeadline.exists(_ <= wm)) {
            state.remove()
          } else {
            state.update(BufferedFunnelState(firsts.toSeq, rest, lastSeen))
            // wake when the watermark reaches the next buffered event (to
            // flush it) or the TTL deadline (to expire) — whichever first;
            // setTimeoutTimestamp requires a value beyond the watermark
            val wake = (rest.map(_._1) ++ ttlDeadline).filter(_ > wm)
            if (wake.nonEmpty) state.setTimeoutTimestamp(wake.min)
          }
          out.iterator
      }
  }
}
