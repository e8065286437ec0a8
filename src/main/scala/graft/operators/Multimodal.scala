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
    def decode(r: MediaRow): MediaFeatures = {
      val h = if (r.payload == null) 0L
        else java.util.Arrays.hashCode(r.payload).toLong & 0xffffffffL
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
}
