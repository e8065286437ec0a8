package graft.streaming

import graft.functions.{TextFunctions, VectorFunctions}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

/** Streaming content deduplication — the training-data ingestion shape of
  * the reference's keyed CDC dedupe (`WatchStream.java:271-279` dedupes ids
  * inside a buffer window): here the key is CONTENT, and suppression spans
  * micro-batches through store-backed keyed state.
  *
  * Two tiers:
  *  - [[exactSimhash]]: near-identical suppression — documents whose
  *    SimHash is equal (whitespace/casing-level edits) are dropped across
  *    batches via `dropDuplicatesWithinWatermark`, Spark's own bounded
  *    dedupe state. Zero custom state; use when hamming tolerance 0 is
  *    enough.
  *  - [[simhashBandFlags]]: hamming ≤ maxDist candidate detection with
  *    pigeonhole banding (maxDist+1 blocks). Per band bucket, keyed state
  *    holds the full fingerprints seen; a document within maxDist of any
  *    seen fingerprint in any of its buckets is flagged. Completeness: two
  *    docs within hamming maxDist share at least one exact block, so they
  *    meet in that bucket (unless its fingerprint aged out of the bounded
  *    state). First arrival wins; flagged docs still insert their
  *    fingerprint where they are new, so a near-dup CHAIN collapses onto
  *    its first element rather than re-admitting slow drift.
  *
  * Scale: state is partitioned by band bucket (RocksDB-backed on a real
  * cluster), bounded by `maxFpsPerBucket` × live buckets, and aged out by
  * the processing-time TTL — the same two knobs as the reference's
  * count/time dedupe buffer (`config.yaml:16-18`).
  */
object StreamingDedupe {

  /** Per-(doc, band) verdict: is_first = no near fingerprint in that
    * bucket. A doc is a near-dup candidate iff ANY band has is_first=false.
    */
  case class BandVerdict(doc_id: Long, band: Int, is_first: Boolean)

  /** Keyed state per band bucket: full fingerprints seen (newest first). */
  case class BucketState(fps: List[Long])

  /** Cross-batch suppression of near-identical documents (equal SimHash).
    * Input must carry an event-time column for the watermark bound.
    */
  def exactSimhash(docs: DataFrame, textCol: String, tsCol: String,
                   watermark: String): DataFrame =
    docs.withWatermark(tsCol, watermark)
      .withColumn("_fp",
        VectorFunctions.simhash(TextFunctions.tokens(col(textCol))))
      .dropDuplicatesWithinWatermark(Seq("_fp"))
      .drop("_fp")

  /** Stateful per-band first-arrival flags for hamming ≤ maxDist near-dup
    * candidate detection (semantics above).
    *
    * @param maxFpsPerBucket cap on fingerprints retained per bucket (oldest
    *                        evicted first); completeness holds while a
    *                        bucket's live set fits the cap
    * @param stateTtlMillis  processing-time TTL per bucket
    */
  def simhashBandFlags(docs: DataFrame, idCol: String, textCol: String,
                       maxDist: Int, maxFpsPerBucket: Int = 10000,
                       stateTtlMillis: Long = 3600000L): Dataset[BandVerdict] = {
    require(maxDist >= 0 && maxDist < 64, "maxDist in [0, 63]")
    val nBlocks = maxDist + 1
    val width = 64 / nBlocks
    val blockStructs = (0 until nBlocks).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("_fp"), b * width)
          .bitwiseAND(lit((1L << width) - 1)).as("bits"))
    }
    implicit val verdictEnc = Encoders.product[BandVerdict]
    implicit val stateEnc = Encoders.product[BucketState]
    implicit val keyEnc = Encoders.STRING
    implicit val rowEnc =
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaInt)
    docs
      .withColumn("_fp",
        VectorFunctions.simhash(TextFunctions.tokens(col(textCol))))
      .select(col(idCol).cast("long").as("id"), col("_fp"),
        explode(array(blockStructs: _*)).as("p"))
      // a null id or null fingerprint (null text) would hit the
      // non-nullable Long encoder slots and kill the STREAMING query
      // mid-batch; such rows carry nothing dedupe-able — drop, same
      // contract as StreamingKmv
      .na.drop(Seq("id", "_fp"))
      .select(concat_ws(":", col("p.band"), col("p.bits")).as("bucket"),
        col("id"), col("_fp").as("fp"), col("p.band").as("band"))
      .as[(String, Long, Long, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.ProcessingTimeTimeout) {
        (_: String, rows: Iterator[(String, Long, Long, Int)],
         state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var fps = state.getOption.map(_.fps).getOrElse(Nil)
            // id order within the batch: deterministic first-arrival
            val verdicts = rows.toSeq.sortBy(_._2).map {
              case (_, id, fp, band) =>
                val near = fps.exists(s =>
                  java.lang.Long.bitCount(s ^ fp) <= maxDist)
                if (!near) fps = (fp :: fps).take(maxFpsPerBucket)
                BandVerdict(id, band, is_first = !near)
            }
            state.update(BucketState(fps))
            state.setTimeoutDuration(stateTtlMillis)
            verdicts.iterator
          }
      }
  }
}
