package graft.streaming

import graft.TestSpark
import graft.operators.Sessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

/** Native session_window streaming aggregation: sessions close and emit when
  * the watermark passes their end (event-time, state-store backed).
  */
class SessionWindowStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("gap-separated events yield separate sessions, emitted on watermark") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val events = mem.toDF().toDF("ts", "user_id").withWatermark("ts", "1 minute")
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val ckpt = Files.createTempDirectory("graft-sw").toString
    val q = Sessionize.sessionWindowStream(events, Seq("user_id"), col("ts"), "5 minutes")
      .select(col("user_id"), col("n_events"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.collect().map(r => (r.getLong(0), r.getLong(1)))
        out.synchronized { out ++= rows }
        ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    try {
      // session A: 10:00 + 10:02 (within 5-min gap); session B: 10:20
      mem.addData((ts(10, 0), 1L), (ts(10, 2), 1L), (ts(10, 20), 1L))
      q.processAllAvailable()
      // watermark driver: push event time far past both sessions' ends
      mem.addData((ts(11, 0), 2L))
      q.processAllAvailable()
      mem.addData((ts(12, 0), 2L))
      q.processAllAvailable()
    } finally q.stop()
    val user1 = out.filter(_._1 == 1L).map(_._2).sorted.toSeq
    assert(user1 == Seq(1L, 2L)) // two sessions: one with 2 events, one with 1
  }
}
