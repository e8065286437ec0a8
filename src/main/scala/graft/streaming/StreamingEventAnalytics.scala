package graft.streaming

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

/** Streaming twins of [[graft.operators.EventAnalytics]]' retention and
  * transition operators, same design as [[StreamingFunnel]]: per-user
  * keyed state sized by the DOMAIN (calendar offsets, type pairs), never
  * by event volume, and monotone first-seen emissions so the stream of
  * outputs is exactly what the batch operator would derive — downstream
  * counting is a plain aggregation over the emitted rows.
  */
object StreamingEventAnalytics {

  /** First activity of a user at a (cohort, offset) cell — emitted once.
    * Downstream `count(*) GROUP BY cohort, offset` IS the retention grid.
    */
  case class FirstActive(user: Long, cohort: Long, offset: Long)

  /** Per-user retention state: the cohort (first bucket ever seen) and
    * the offsets already emitted. Bounded by the calendar span (weeks per
    * horizon), not by event count.
    */
  case class RetState(cohort: Long, seen: Seq[Long])

  /** `rows`: streaming frame with long `userCol` and long `bucketCol`
    * (pre-bucketed epoch week/day). The cohort is the user's first bucket
    * IN ARRIVAL ORDER (per-batch min — under in-order per-user delivery
    * this equals the batch min-bucket cohort; a late earlier bucket
    * would re-anchor the cohort in batch but cannot retract stream
    * emissions — the same one-sided contract as [[StreamingFunnel]]).
    */
  def retention(rows: DataFrame, userCol: String, bucketCol: String)
      : Dataset[FirstActive] = {
    implicit val inEnc = ExpressionEncoder[(Long, Long)]()
    implicit val stEnc = ExpressionEncoder[RetState]()
    implicit val outEnc = ExpressionEncoder[FirstActive]()
    implicit val keyEnc = ExpressionEncoder[Long]()
    rows
      .select(col(userCol).cast("long").as("u"),
        col(bucketCol).cast("long").as("b"))
      .na.drop(Seq("u", "b"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[(Long, Long)],
         state: GroupState[RetState]) =>
          val bs = batch.map(_._2).toArray.sorted
          if (bs.isEmpty) Iterator.empty
          else {
            val st = state.getOption.getOrElse(RetState(bs.head, Seq.empty))
            val seen = scala.collection.mutable.Set(st.seen: _*)
            val out = scala.collection.mutable.ArrayBuffer.empty[FirstActive]
            bs.foreach { b =>
              val off = b - st.cohort
              if (off >= 0 && !seen(off)) {
                seen += off
                out += FirstActive(user, st.cohort, off)
              }
            }
            state.update(RetState(st.cohort, seen.toSeq.sorted))
            out.iterator
          }
      }
  }

  /** One observed consecutive transition of a user's stream. Downstream
    * `count(*) GROUP BY from_type, to_type` IS the batch transition-count
    * grid (probabilities are a windowed ratio over that bounded grid).
    */
  case class Transition(user: Long, ord: Long, from_type: String,
                        to_type: String)

  /** Per-user last event carried across batches: (ord, type). */
  case class LastEvent(ord: Long, typ: String)

  /** `rows`: streaming frame with long `userCol`, long `ordCol`, string
    * `typeCol`. Emits each consecutive (from, to) pair exactly once under
    * per-user in-order delivery — the per-batch fold sorts by ord and the
    * last event rides keyed state, so batch boundaries are invisible to
    * the pairing.
    */
  def transitions(rows: DataFrame, userCol: String, ordCol: String,
                  typeCol: String): Dataset[Transition] = {
    implicit val inEnc = ExpressionEncoder[(Long, Long, String)]()
    implicit val stEnc = ExpressionEncoder[LastEvent]()
    implicit val outEnc = ExpressionEncoder[Transition]()
    implicit val keyEnc = ExpressionEncoder[Long]()
    rows
      .select(col(userCol).cast("long").as("u"),
        col(ordCol).cast("long").as("o"), col(typeCol).cast("string").as("t"))
      .na.drop(Seq("u", "o", "t"))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[(Long, Long, String)],
         state: GroupState[LastEvent]) =>
          val evs = batch.toArray.sortBy(_._2)
          if (evs.isEmpty) Iterator.empty
          else {
            var last = state.getOption
            val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
            evs.foreach { case (_, ord, typ) =>
              last.foreach(l => out += Transition(user, ord, l.typ, typ))
              last = Some(LastEvent(ord, typ))
            }
            state.update(last.get)
            out.iterator
          }
      }
  }
}
