package graft.streaming

import graft.cdc.CdcPipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming form of the CDC plane — the engine's equivalent of
  * the reference's `watch` command (WatchStream.java:61-136).
  *
  * Semantics mapping (SURVEY §7):
  *   - count-or-time dedupe window (bufferTimeout(100k, 5s)) → micro-batch =
  *     `Trigger.ProcessingTime(windowMillis)` for the time arm; the count arm
  *     is enforced at the SOURCE (`maxOffsetsPerTrigger` / `maxFilesPerTrigger`
  *     on the reader), which is where Spark bounds batch size.
  *   - dedupe state RESETS per flush in the reference (ids re-emit in later
  *     windows — its tests assert this); per-micro-batch `foreachBatch` +
  *     batch-local dedupe reproduces exactly that. Cross-window dedupe is a
  *     deliberate semantic upgrade via [[dedupedAcrossBatches]].
  *   - ref-counted XACK/XDEL protocol → checkpoint epoch commit: a batch's
  *     offsets commit only after the sink write returns, giving at-least-once
  *     into any sink and exactly-once into idempotent/transactional ones —
  *     strictly stronger than the reference (no pending-entry loss on crash,
  *     cf. its unused recovery knobs, RedisSource.java:29-34).
  *
  * Input contract: a STREAMING DataFrame with `id`, `table`, `envelope` —
  * from any source (Kafka, file, socket, a custom Redis-stream DSv2
  * connector); tests use MemoryStream. Output: per-epoch parquet (or any
  * writer the caller supplies) of (target, chunk_no, ids, n_ids, epoch).
  */
object CdcStream {

  /** Start the pipeline with the default parquet sink. */
  def start(records: DataFrame, routes: DataFrame, maxBatch: Int,
            outDir: String, checkpointDir: String,
            windowMillis: Long = 5000L): StreamingQuery =
    startWith(records, routes, maxBatch, checkpointDir, windowMillis) {
      (batch, epoch) =>
        batch.withColumn("epoch", lit(epoch))
          .write.mode("append").parquet(outDir)
    }

  /** Start with a caller-supplied epoch writer (e.g. a Redis XADD writer in
    * production, memory sink in tests). The writer receives the BATCHED
    * output (target, chunk_no, ids, n_ids) for one epoch.
    */
  def startWith(records: DataFrame, routes: DataFrame, maxBatch: Int,
                checkpointDir: String, windowMillis: Long)(
                writer: (DataFrame, Long) => Unit): StreamingQuery =
    records.writeStream
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        // batch-local dedupe = reference flush semantics (state reset/window)
        writer(CdcPipeline.run(batch, routes, maxBatch), epoch)
      }
      .trigger(Trigger.ProcessingTime(windowMillis))
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Semantic-upgrade variant: dedupe persists ACROSS micro-batches within a
    * watermark horizon (`dropDuplicatesWithinWatermark`) — an id seen twice
    * within the horizon is emitted once, ever. Requires an event-time column.
    */
  def dedupedAcrossBatches(parsed: DataFrame, eventTimeCol: String,
                           horizon: String): DataFrame =
    parsed.withWatermark(eventTimeCol, horizon)
      .dropDuplicatesWithinWatermark("target", "entity_id")
}
