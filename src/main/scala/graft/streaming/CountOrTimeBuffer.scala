package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Exact count-OR-time buffered flush — the reference's `bufferTimeout(n, t)`
  * semantics (WatchStream.java:271,284) that Spark triggers alone cannot
  * express (triggers are time-only; `maxOffsetsPerTrigger` caps input, not
  * per-key buffers).
  *
  * Keyed state via `flatMapGroupsWithState`: per target, ids accumulate
  * (keep-first deduped) until EITHER the buffer reaches `maxCount` (flushed
  * inline, same micro-batch) OR `dwellMillis` of processing time passes
  * (flushed by the state timeout on a later trigger). State is store-backed
  * (RocksDB/HDFS at scale), partitioned by target — the same per-target
  * serialization the reference gets from one flux per target, but
  * fault-tolerant and spillable.
  */
object CountOrTimeBuffer {

  /** One flushed buffer: the target and its deduped ids in arrival order. */
  case class Flush(target: String, ids: Seq[Int], reason: String)

  /** State: arrival-ordered deduped buffer per target. */
  case class Buf(ids: List[Int])

  /** @param parsed streaming Dataset of (target, entityId)
    * @return streaming Dataset of [[Flush]] records (append mode)
    */
  def apply(parsed: Dataset[(String, Int)], maxCount: Int,
            dwellMillis: Long): Dataset[Flush] = {
    implicit val flushEnc = Encoders.product[Flush]
    implicit val bufEnc = Encoders.product[Buf]
    implicit val str = Encoders.STRING
    parsed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.ProcessingTimeTimeout) {
        (target: String, rows: Iterator[(String, Int)], state: GroupState[Buf]) =>
          if (state.hasTimedOut) {
            val buffered = state.getOption.map(_.ids.reverse).getOrElse(Nil)
            state.remove()
            if (buffered.isEmpty) Iterator.empty
            else Iterator(Flush(target, buffered, "time"))
          } else {
            // keep-first dedupe against both state and this batch's rows
            var ids = state.getOption.map(_.ids).getOrElse(Nil) // reversed order
            var seen = ids.toSet
            val flushes = scala.collection.mutable.ArrayBuffer[Flush]()
            rows.foreach { case (_, id) =>
              if (!seen.contains(id)) {
                ids = id :: ids
                seen += id
                if (seen.size >= maxCount) {
                  flushes += Flush(target, ids.reverse, "count")
                  ids = Nil; seen = Set.empty
                }
              }
            }
            if (ids.isEmpty) state.remove()
            else {
              state.update(Buf(ids))
              state.setTimeoutDuration(dwellMillis)
            }
            flushes.iterator
          }
      }
  }
}
