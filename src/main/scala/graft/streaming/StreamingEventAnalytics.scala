package graft.streaming

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{Column, DataFrame, Dataset}

/** Streaming twins of [[graft.operators.EventAnalytics]]' retention and
  * transition operators, same design as [[StreamingFunnel]]: per-user
  * keyed state sized by the DOMAIN (calendar offsets, type pairs), never
  * by event volume, and monotone first-seen emissions so the stream of
  * outputs is exactly what the batch operator would derive — downstream
  * counting is a plain aggregation over the emitted rows.
  *
  * Each operator comes in the same two delivery contracts as the funnel:
  * the processing-order fold (in-order per-key delivery assumed; late
  * events under-count, never over-count) and a `...Buffered` watermark
  * variant (events wait in state until the event-time watermark passes
  * them, so disorder within the configured delay is invisible and the
  * emissions equal the batch operator exactly). Both take an optional
  * idle-TTL knob that drops a key's state after inactivity — the
  * retention-policy bound production state stores need.
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
    * `idleTtl` (e.g. "30 days"): drop a user's state after that much
    * processing-time inactivity (a re-appearing user re-anchors).
    */
  def retention(rows: DataFrame, userCol: String, bucketCol: String,
                idleTtl: Option[String] = None): Dataset[FirstActive] = {
    implicit val inEnc = ExpressionEncoder[(Long, Long)]()
    implicit val stEnc = ExpressionEncoder[RetState]()
    implicit val outEnc = ExpressionEncoder[FirstActive]()
    implicit val keyEnc = ExpressionEncoder[Long]()
    val timeout = if (idleTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
                  else GroupStateTimeout.NoTimeout
    rows
      .select(col(userCol).cast("long").as("u"),
        col(bucketCol).cast("long").as("b"))
      .na.drop(Seq("u", "b"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, timeout) {
        (user: Long, batch: Iterator[(Long, Long)],
         state: GroupState[RetState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
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
              idleTtl.foreach(state.setTimeoutDuration)
              out.iterator
            }
          }
      }
  }

  /** [[retentionBuffered]] state: anchored cohort (Long.MinValue until the
    * first watermark flush), emitted offsets, the (ord, bucket) buffer of
    * not-yet-ripe events, and the max event time seen (TTL anchor).
    */
  case class BufferedRetState(cohort: Long, seen: Seq[Long],
                              buf: Seq[(Long, Long)], lastSeen: Long)

  /** Out-of-order-safe retention: `ordCol` is EPOCH MILLIS event time
    * (the raw event timestamp), `bucketCol` the derived retention bucket.
    * Events buffer until the watermark passes their ord; the cohort
    * anchors at the first flush to the MINIMUM buffered bucket — since
    * every event at or below the watermark has arrived (disorder within
    * `delay`), that minimum IS the batch cohort, so emissions equal the
    * batch operator exactly for any disorder the delay covers.
    */
  def retentionBuffered(rows: DataFrame, userCol: String, ordCol: String,
                        bucketCol: String, delay: String,
                        idleTtlMs: Option[Long] = None): Dataset[FirstActive] = {
    implicit val inEnc = ExpressionEncoder[(Long, Long, Long, java.sql.Timestamp)]()
    implicit val stEnc = ExpressionEncoder[BufferedRetState]()
    implicit val outEnc = ExpressionEncoder[FirstActive]()
    implicit val keyEnc = ExpressionEncoder[Long]()
    rows
      .select(col(userCol).cast("long").as("u"),
        col(ordCol).cast("long").as("o"), col(bucketCol).cast("long").as("b"))
      .na.drop(Seq("u", "o", "b"))
      .withColumn("_ts", timestamp_millis(col("o")))
      .withWatermark("_ts", delay)
      // _ts rides along: the analyzer requires the watermarked column in
      // the fMGWS input to accept an event-time timeout
      .as[(Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
          GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[(Long, Long, Long, java.sql.Timestamp)],
         state: GroupState[BufferedRetState]) =>
          val st = state.getOption.getOrElse(
            BufferedRetState(Long.MinValue, Nil, Nil, Long.MinValue))
          val arrived = batch.map(e => (e._2, e._3)).toSeq
          val buf = st.buf ++ arrived
          val lastSeen = (st.lastSeen +: arrived.map(_._1)).max
          val wm = state.getCurrentWatermarkMs()
          val (ripe, rest) = buf.partition(_._1 <= wm)
          val out = scala.collection.mutable.ArrayBuffer.empty[FirstActive]
          var cohort = st.cohort
          val seen = scala.collection.mutable.Set(st.seen: _*)
          if (ripe.nonEmpty) {
            if (cohort == Long.MinValue) cohort = ripe.map(_._2).min
            ripe.map(_._2).sorted.foreach { b =>
              val off = b - cohort
              if (off >= 0 && !seen(off)) {
                seen += off
                out += FirstActive(user, cohort, off)
              }
            }
          }
          val ttlDeadline = idleTtlMs.map(t => lastSeen + t)
          if (rest.isEmpty && ttlDeadline.exists(_ <= wm)) {
            state.remove()
          } else {
            state.update(
              BufferedRetState(cohort, seen.toSeq.sorted, rest, lastSeen))
            val wake = (rest.map(_._1) ++ ttlDeadline).filter(_ > wm)
            if (wake.nonEmpty) state.setTimeoutTimestamp(wake.min)
          }
          out.iterator
      }
  }

  /** One observed consecutive transition of a user's stream. Downstream
    * `count(*) GROUP BY from_type, to_type` IS the batch transition-count
    * grid (probabilities are a windowed ratio over that bounded grid).
    * `ord` is the to-event's ord; (user, ord) identifies the emission
    * uniquely when ords are unique per user — with a tiebreak column in
    * play, uniqueness is (user, ord, tiebreak of the to-event).
    */
  case class Transition(user: Long, ord: Long, from_type: String,
                        to_type: String)

  /** Per-user last event carried across batches: (ord, tiebreak, type). */
  case class LastEvent(ord: Long, tb: Long, typ: String)

  /** `rows`: streaming frame with long `userCol`, long `ordCol`, string
    * `typeCol`, and optionally a long `tiebreakCol`. Emits each
    * consecutive (from, to) pair exactly once under per-user in-order
    * delivery — the per-batch fold sorts by (ord, tiebreak) exactly like
    * the batch twin's `ordCols = Seq(ord, tiebreak)`, and the last event
    * rides keyed state, so batch boundaries are invisible to the pairing.
    * Without a tiebreak column, batch parity requires ords unique per
    * user: same-ord events would pair in a nondeterministic order.
    * `idleTtl`: processing-time inactivity bound on the per-user state.
    */
  def transitions(rows: DataFrame, userCol: String, ordCol: String,
                  typeCol: String, tiebreakCol: Option[String] = None,
                  idleTtl: Option[String] = None): Dataset[Transition] = {
    implicit val inEnc = ExpressionEncoder[(Long, Long, Long, String)]()
    implicit val stEnc = ExpressionEncoder[LastEvent]()
    implicit val outEnc = ExpressionEncoder[Transition]()
    implicit val keyEnc = ExpressionEncoder[Long]()
    val timeout = if (idleTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
                  else GroupStateTimeout.NoTimeout
    val tb: Column = tiebreakCol.map(col(_).cast("long")).getOrElse(lit(0L))
    rows
      .select(col(userCol).cast("long").as("u"),
        col(ordCol).cast("long").as("o"), tb.as("tb"),
        col(typeCol).cast("string").as("t"))
      .na.drop(Seq("u", "o", "tb", "t"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, timeout) {
        (user: Long, batch: Iterator[(Long, Long, Long, String)],
         state: GroupState[LastEvent]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val evs = batch.toArray.sortBy(e => (e._2, e._3))
            if (evs.isEmpty) Iterator.empty
            else {
              var last = state.getOption
              val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
              evs.foreach { case (_, ord, t, typ) =>
                last.foreach(l => out += Transition(user, ord, l.typ, typ))
                last = Some(LastEvent(ord, t, typ))
              }
              state.update(last.get)
              idleTtl.foreach(state.setTimeoutDuration)
              out.iterator
            }
          }
      }
  }

  /** [[transitionsBuffered]] state: the last folded event, the not-yet-ripe
    * buffer, and the max event time seen (TTL anchor). `last.ord` is
    * Long.MinValue until the first flush.
    */
  case class BufferedTransState(lastOrd: Long, lastTb: Long, lastTyp: String,
                                buf: Seq[(Long, Long, String)], lastSeen: Long)

  /** Out-of-order-safe transitions: `ordCol` is EPOCH MILLIS event time;
    * events buffer until the watermark passes them, then fold in
    * (ord, tiebreak) order — for disorder within `delay` the emissions
    * equal the batch twin exactly.
    */
  def transitionsBuffered(rows: DataFrame, userCol: String, ordCol: String,
                          typeCol: String, delay: String,
                          tiebreakCol: Option[String] = None,
                          idleTtlMs: Option[Long] = None): Dataset[Transition] = {
    implicit val inEnc =
      ExpressionEncoder[(Long, Long, Long, String, java.sql.Timestamp)]()
    implicit val stEnc = ExpressionEncoder[BufferedTransState]()
    implicit val outEnc = ExpressionEncoder[Transition]()
    implicit val keyEnc = ExpressionEncoder[Long]()
    val tb: Column = tiebreakCol.map(col(_).cast("long")).getOrElse(lit(0L))
    rows
      .select(col(userCol).cast("long").as("u"),
        col(ordCol).cast("long").as("o"), tb.as("tb"),
        col(typeCol).cast("string").as("t"))
      .na.drop(Seq("u", "o", "tb", "t"))
      .withColumn("_ts", timestamp_millis(col("o")))
      .withWatermark("_ts", delay)
      // _ts rides along: the analyzer requires the watermarked column in
      // the fMGWS input to accept an event-time timeout
      .as[(Long, Long, Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
          GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[(Long, Long, Long, String, java.sql.Timestamp)],
         state: GroupState[BufferedTransState]) =>
          val st = state.getOption.getOrElse(
            BufferedTransState(Long.MinValue, 0L, "", Nil, Long.MinValue))
          val arrived = batch.map(e => (e._2, e._3, e._4)).toSeq
          val buf = st.buf ++ arrived
          val lastSeen = (st.lastSeen +: arrived.map(_._1)).max
          val wm = state.getCurrentWatermarkMs()
          val (ripe, rest) = buf.partition(_._1 <= wm)
          val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
          var last = st
          ripe.sortBy(e => (e._1, e._2)).foreach { case (ord, t, typ) =>
            if (last.lastOrd != Long.MinValue)
              out += Transition(user, ord, last.lastTyp, typ)
            last = last.copy(lastOrd = ord, lastTb = t, lastTyp = typ)
          }
          val ttlDeadline = idleTtlMs.map(t => lastSeen + t)
          if (rest.isEmpty && ttlDeadline.exists(_ <= wm)) {
            state.remove()
          } else {
            state.update(last.copy(buf = rest, lastSeen = lastSeen))
            val wake = (rest.map(_._1) ++ ttlDeadline).filter(_ > wm)
            if (wake.nonEmpty) state.setTimeoutTimestamp(wake.min)
          }
          out.iterator
      }
  }
}
