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
  * Monotonicity is the load-bearing property: under in-order processing a
  * user's `first(k)` is SET ONCE and never revised — so the stream of
  * emissions is exactly the batch operator's reach-set rows, with no
  * retractions and no duplicate (user, step) pairs. Each micro-batch's
  * events are sorted by ord inside the group before folding, which makes
  * the per-batch fold order-insensitive; ACROSS batches the source must
  * deliver a user's events in ord order (the usual per-key ordering of a
  * log-backed source — both graft DSv2 sources preserve it). An event
  * arriving after a later-ord event of the same user has already been
  * folded may under-count that user's progression (the event it would
  * have unlocked is gone) — never over-count; that one-sided error is the
  * standard funnel-engine contract, and the batch operator over the full
  * log remains the reconciliation path.
  *
  * Tie semantics match batch exactly: a step-k event at the same ord as
  * the step-(k-1) completion is rejected (strictly-after), in any fold
  * order of the tied events.
  *
  * Scale: state per user is one long per funnel step regardless of event
  * volume; each batch shuffles only its own rows to the user's partition;
  * RocksDB-backed via GraftSession's conf-gated provider. Production runs
  * would add a state TTL for abandoned users (timeout config left to the
  * caller's retention policy — dropping a user's state simply stops
  * extending their funnel).
  */
object StreamingFunnel {

  /** A step first completed in this micro-batch. `step` is 1-based. */
  case class StepReached(user: Long, step: Int, first_ord: Long)

  /** Per-user earliest-qualifying ord per step; -1 = unreached. */
  case class FunnelState(firsts: Seq[Long])

  /** `rows`: a streaming DataFrame with long `userCol`, long `ordCol` and
    * int `stepCol` (0-based step index, pre-matched upstream — step
    * predicates are plain Column logic, e.g. a `when` chain over
    * event_type). Emits one [[StepReached]] per (user, step) ever, in
    * Update mode.
    */
  def reach(rows: DataFrame, userCol: String, ordCol: String,
            stepCol: String, nSteps: Int): Dataset[StepReached] = {
    require(nSteps >= 1, "funnel needs at least one step")
    implicit val inEnc = ExpressionEncoder[(Long, Long, Int)]()
    implicit val stEnc = ExpressionEncoder[FunnelState]()
    implicit val outEnc = ExpressionEncoder[StepReached]()
    implicit val keyEnc = ExpressionEncoder[Long]()
    rows
      .select(col(userCol).cast("long").as("u"),
        col(ordCol).cast("long").as("o"), col(stepCol).cast("int").as("s"))
      .na.drop(Seq("u", "o", "s"))
      .as[(Long, Long, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[(Long, Long, Int)],
         state: GroupState[FunnelState]) =>
          val firsts = state.getOption
            .map(_.firsts.toArray)
            .getOrElse(Array.fill(nSteps)(-1L))
          val out = scala.collection.mutable.ArrayBuffer.empty[StepReached]
          // ascending ord fold == the batch chained-min semantics; ties in
          // ord resolve identically in any order (strictly-after rejects)
          batch.toArray.sortBy(_._2).foreach { case (_, ord, s) =>
            if (s >= 0 && s < nSteps && firsts(s) == -1L &&
                (s == 0 || (firsts(s - 1) != -1L && ord > firsts(s - 1)))) {
              firsts(s) = ord
              out += StepReached(user, s + 1, ord)
            }
          }
          if (out.nonEmpty) state.update(FunnelState(firsts.toSeq))
          out.iterator
      }
  }
}
