package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

/** Cross-batch dedupe via dropDuplicatesWithinWatermark (the semantic
  * upgrade over the reference's per-flush state reset): an id re-arriving in
  * a LATER micro-batch within the horizon is suppressed.
  */
class WatermarkDedupeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("id re-arriving in a later batch within the horizon is emitted once") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Int)]
    val parsed = mem.toDF().toDF("event_time", "target", "entity_id")
    val out = scala.collection.mutable.ArrayBuffer[(String, Int)]()
    val ckpt = Files.createTempDirectory("graft-wm").toString
    val q = CdcStream.dedupedAcrossBatches(parsed, "event_time", "10 minutes")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.select("target", "entity_id").collect()
          .map(r => (r.getString(0), r.getInt(1)))
        out.synchronized { out ++= rows }
        ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    try {
      mem.addData((ts(0), "t", 1), (ts(1), "t", 1), (ts(1), "t", 2))
      q.processAllAvailable()
      // later batch, same ids within the 10-minute horizon -> suppressed
      mem.addData((ts(2), "t", 1), (ts(2), "t", 2), (ts(3), "t", 3))
      q.processAllAvailable()
    } finally q.stop()
    assert(out.sorted.toSeq == Seq(("t", 1), ("t", 2), ("t", 3)))
  }
}
