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
}
