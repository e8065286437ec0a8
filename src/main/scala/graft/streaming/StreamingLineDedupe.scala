package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

/** Streaming line-level boilerplate removal — the ingestion-time shape of
  * [[graft.operators.Dedup.lineDedupe]]: as documents arrive, each line's
  * document-frequency accumulates in keyed state, and a line is dropped
  * from every document that arrives AFTER the line has been seen in more
  * than `maxDf` distinct documents. Verdicts are prefix-consistent (a
  * stream can't retract already-emitted docs): early copies of a banner
  * pass through, the (maxDf+1)-th onward is stripped — the batch operator
  * re-run over the full corpus remains the retroactive ground truth.
  *
  * State per line is BOUNDED BY CONSTRUCTION at maxDf+1 doc ids: once the
  * set exceeds maxDf the line is heavy forever, so no further ids are
  * recorded. Storing the ids (not a count) makes the STATE idempotent
  * under at-least-once replay — re-delivering a micro-batch re-adds the
  * same doc ids and the df never double-counts (the same law
  * [[StreamingKmv]] pins for its sketch); the emitted verdicts themselves
  * are at-least-once (a replayed batch that had just saturated a line
  * re-emits its docs with the now-heavy verdict). Keyed by a 64-bit line
  * hash: the stream shuffles (hash, doc_id, pos) tuples, one line text
  * copy each.
  *
  * Output: one verdict row per input line, in Append mode. All lines of a
  * document explode from one input row, so they land in the same output
  * micro-batch — reassemble per batch (e.g. in `foreachBatch`) with
  * [[reassemble]], which reuses the batch operator's order-preserving
  * rebuild.
  */
object StreamingLineDedupe {

  /** Verdict for one line occurrence: keep=false ⇒ the line was already
    * boilerplate (df > maxDf in PRIOR arrivals) when this doc arrived.
    */
  case class LineVerdict(doc_id: Long, pos: Int, line: String, keep: Boolean)

  /** Keyed state per line hash: distinct doc ids seen, capped at maxDf+1
    * (`saturated` once df exceeds maxDf — ids no longer tracked).
    */
  case class LineDf(ids: List[Long], saturated: Boolean)

  def verdicts(docs: DataFrame, idCol: String, textCol: String,
               maxDf: Int, delim: String = "\n",
               stateTtlMillis: Long = 0L): Dataset[LineVerdict] = {
    require(maxDf >= 1, "verdicts: maxDf must be >= 1")
    implicit val outEnc = Encoders.product[LineVerdict]
    implicit val stateEnc = Encoders.product[LineDf]
    implicit val keyEnc = Encoders.scalaLong
    implicit val rowEnc = Encoders.tuple(Encoders.scalaLong,
      Encoders.scalaLong, Encoders.scalaInt, Encoders.STRING)
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(split(coalesce(col(textCol), lit("")), delim))
          .as(Seq("pos", "line")))
      // null ids carry nothing reassemblable — drop, same contract as
      // StreamingKmv / simhashBandFlags
      .na.drop(Seq("doc_id"))
      .select(xxhash64(col("line")).as("h"), col("doc_id"),
        col("pos"), col("line"))
      .as[(Long, Long, Int, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.ProcessingTimeTimeout) {
        (_: Long, rows: Iterator[(Long, Long, Int, String)],
         state: GroupState[LineDf]) =>
          if (!state.exists && rows.isEmpty) {
            // TTL wake-up on an already-removed key
            Iterator.empty
          } else if (rows.isEmpty) {
            state.remove() // TTL expiry: the line's df window lapsed
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(LineDf(Nil, saturated = false))
            // heavy as of the START of this batch: verdicts are batch-
            // atomic (a banner first flooding in within one batch keeps
            // that batch's copies — the arrival order inside a batch is
            // not meaningful, so no verdict depends on it)
            val heavyAtStart = st.saturated
            val out = rows.map { case (_, docId, pos, line) =>
              if (!st.saturated && !st.ids.contains(docId)) {
                val ids = docId :: st.ids
                st = if (ids.length > maxDf) LineDf(Nil, saturated = true)
                     else LineDf(ids, saturated = false)
              }
              LineVerdict(docId, pos, line, keep = !heavyAtStart)
            }.toList
            state.update(st)
            if (stateTtlMillis > 0L)
              state.setTimeoutDuration(stateTtlMillis)
            out.iterator
          }
      }
  }

  /** Batch-local order-preserving reassembly of a verdict micro-batch —
    * the `foreachBatch` companion. Same rebuild shape as the batch
    * operator: one hash agg, sort_array over (pos, line), no window.
    */
  def reassemble(verdicts: DataFrame, delim: String = "\n"): DataFrame = {
    val total = verdicts.groupBy("doc_id").agg(count(lit(1)).as("n_lines"))
    val kept = verdicts.filter(col("keep"))
      .groupBy("doc_id").agg(
        array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("line")))),
            s => s("line")), delim).as("clean_text"),
        count(lit(1)).as("n_kept"))
    total.join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }
}
