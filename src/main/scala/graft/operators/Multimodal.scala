package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque `binary`
  * columns with a typed metadata struct, plus a partition-batched
  * decode/feature-extract stage.
  *
  * The decode itself is a STUB (this container ships no image/audio codecs):
  * [[FakeCodec]] derives deterministic "features" from the payload hash so the
  * Spark-side contract — schema, per-partition batching, null/corrupt-payload
  * behavior, partitioning — is fully real and testable. Swapping in a real
  * codec is a one-function change.
  *
  * Scale: decode is the canonical CPU-heavy map stage. `mapPartitions` keeps
  * codec initialization per-partition (not per-row), payloads never shuffle
  * before decode, and the output projects features only (bytes are dropped as
  * early as possible — at 100 TB the binary column dominates I/O, so feature
  * extraction must run directly over the scan before any wide operator).
  */
object Multimodal {

  case class MediaRow(media_id: Long, mime: String, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, mime: String, byte_len: Int,
                           width: Int, height: Int, sharpness: Double)

  /** Wrap any table into the multimodal schema: payload = binary column +
    * typed metadata (mime, byte length, content hash).
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
              mime: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(mime).as("mime"),
      col(payloadCol).cast("binary").as("payload"))
      .withColumn("meta", struct(
        length(col("payload")).as("byte_len"),
        md5(col("payload")).as("content_hash"),
        col("mime").as("mime")))

  /** STUB decoder: deterministic pseudo-features from the payload bytes.
    * Replace `decode` with a real codec (e.g. TwelveMonkeys/JavaCV) when
    * available; signature and batching stay identical.
    */
  object FakeCodec {
    /** STUB demuxer: fixed 256-byte windows as "frames". */
    def splitFrames(payload: Array[Byte]): Array[Array[Byte]] =
      if (payload == null || payload.isEmpty) Array.empty
      else payload.grouped(256).toArray

    /** STUB resampler: deterministic byte subsample to `target` bytes. */
    def resample(payload: Array[Byte], target: Int): Array[Byte] =
      if (payload == null || payload.isEmpty) Array.emptyByteArray
      else {
        val out = new Array[Byte](math.min(target, payload.length))
        val step = payload.length.toDouble / out.length
        var i = 0
        while (i < out.length) { out(i) = payload((i * step).toInt); i += 1 }
        out
      }

    def decode(r: MediaRow): MediaFeatures = {
      // feature seed = first 32 bits of md5(payload): a standard digest (not
      // a JVM-specific hash) so the stub's output is reproducible by any
      // engine for cross-checking
      val h = if (r.payload == null) 0L
        else {
          val d = java.security.MessageDigest.getInstance("MD5").digest(r.payload)
          ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        }
      MediaFeatures(r.media_id, r.mime,
        if (r.payload == null) 0 else r.payload.length,
        width = (h % 1920L).toInt + 1,
        height = ((h >> 11) % 1080L).toInt + 1,
        sharpness = ((h >> 22) % 1000L).toDouble / 1000.0)
    }
  }

  /** Partition-batched decode/feature-extract. One codec "session" per
    * partition (the `iter =>` prologue is where a real codec would init);
    * corrupt/null payloads yield zeroed features instead of failing the task.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("media_id", "mime", "payload").as[MediaRow]
      .mapPartitions { iter =>
        // real codec init would happen here, once per partition
        iter.map(FakeCodec.decode)
      }
  }

  case class Frame(media_id: Long, frame_no: Int, ts_ms: Long,
                   frame_payload: Array[Byte])

  /** Frame sampling: one video row → every `stride`-th frame, capped at
    * `maxFrames` per video. The row-explosion contract is the real design
    * decision at scale — sampling BEFORE any shuffle (flatMap over the scan,
    * output rows carry only the sampled frame bytes, never the full video),
    * so downstream per-frame featurization parallelizes past the per-video
    * skew. The frame split itself is stubbed (no codecs in this container):
    * deterministic fixed-size windows over the payload stand in for decoded
    * frames; a real demuxer swaps into `splitFrames` only.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, stride: Int,
                   maxFrames: Int, fps: Double = 30.0): Dataset[Frame] = {
    import spark.implicits._
    require(stride > 0 && maxFrames > 0)
    media.select("media_id", "mime", "payload").as[MediaRow]
      .flatMap { r =>
        val frames = FakeCodec.splitFrames(r.payload)
        Iterator.range(0, frames.length, stride).take(maxFrames).map { i =>
          Frame(r.media_id, i, math.round(i * 1000.0 / fps), frames(i))
        }
      }
  }

  case class Resized(media_id: Long, width: Int, height: Int,
                     thumb: Array[Byte])

  /** Resize-to-thumbnail: partition-batched like [[extractFeatures]]; the
    * pixel resample is stubbed (deterministic byte subsample preserving the
    * target size contract), the Spark plumbing — schema, per-partition codec
    * reuse, output byte budget — is real.
    */
  def resize(spark: SparkSession, media: DataFrame, w: Int, h: Int): Dataset[Resized] = {
    import spark.implicits._
    media.select("media_id", "mime", "payload").as[MediaRow]
      .mapPartitions { iter =>
        // real scaler init once per partition
        iter.map { r =>
          Resized(r.media_id, w, h, FakeCodec.resample(r.payload, w * h))
        }
      }
  }
}
