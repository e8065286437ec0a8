package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val media = Multimodal.asMedia(
    Seq((1L, "hello world"), (2L, ""), (3L, "payload three"))
      .toDF("doc_id", "text"), "doc_id", "text", "text/plain")

  test("media schema: binary payload + typed metadata struct") {
    val f = media.schema("payload")
    assert(f.dataType.typeName == "binary")
    val meta = media.select("meta.byte_len", "meta.content_hash", "meta.mime")
      .collect().head
    assert(meta.getInt(0) == 11)
    assert(meta.getString(2) == "text/plain")
  }

  test("feature extraction is deterministic and total (no nulls poison it)") {
    val out1 = Multimodal.extractFeatures(spark, media).collect().sortBy(_.media_id)
    val out2 = Multimodal.extractFeatures(spark, media).collect().sortBy(_.media_id)
    assert(out1.toSeq == out2.toSeq)
    assert(out1.length == 3)
    assert(out1.forall(f => f.width >= 1 && f.height >= 1))
  }

  test("null payload yields zeroed features instead of task failure") {
    val withNull = media.withColumn("payload",
      when(col("media_id") === 2, lit(null)).otherwise(col("payload")))
    val out = Multimodal.extractFeatures(spark, withNull)
      .collect().find(_.media_id == 2L).get
    assert(out.byte_len == 0)
  }

  test("frame sampling: stride + cap honored, bytes from the source payload") {
    // 1000-byte payload -> 4 stub frames of 256/256/256/232 bytes
    val big = Seq((7L, Array.fill[Byte](1000)(3))).toDF("media_id", "payload")
    val m = Multimodal.asMedia(big, "media_id", "payload", "video/fake")
    val frames = Multimodal.sampleFrames(spark, m, stride = 2, maxFrames = 10)
      .collect().sortBy(_.frame_no)
    assert(frames.map(_.frame_no).toSeq == Seq(0, 2)) // every 2nd of 4
    assert(frames.head.frame_payload.length == 256)
    assert(frames.head.ts_ms == 0 && frames(1).ts_ms == 67) // 2/30s = 66.7ms
    val capped = Multimodal.sampleFrames(spark, m, stride = 1, maxFrames = 2)
      .collect()
    assert(capped.length == 2)
    // empty payload -> no frames, no failure
    val empty = Multimodal.asMedia(
      Seq((8L, Array.emptyByteArray)).toDF("media_id", "payload"),
      "media_id", "payload", "video/fake")
    assert(Multimodal.sampleFrames(spark, empty, 1, 10).count() == 0)
  }

  test("resize: output byte budget and determinism") {
    val out = Multimodal.resize(spark, media, 4, 3).collect().sortBy(_.media_id)
    assert(out.forall(r => r.width == 4 && r.height == 3))
    assert(out.forall(r => r.thumb.length <= 12))
    val again = Multimodal.resize(spark, media, 4, 3).collect().sortBy(_.media_id)
    assert(out.map(_.thumb.toSeq).toSeq == again.map(_.thumb.toSeq).toSeq)
  }
}
