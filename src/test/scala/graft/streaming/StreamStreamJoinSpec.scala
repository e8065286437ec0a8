package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

/** Stream-stream inner join with watermarked time-bound state — the CDC
  * enrichment pattern (change events joined to a stream of dimension
  * updates): state on both sides is bounded by watermark + the time-range
  * predicate, so the join runs indefinitely without unbounded state.
  */
class StreamStreamJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("events enrich against dim updates within the join window") {
    implicit val sq = spark.sqlContext
    val evMem = MemoryStream[(Timestamp, Long, String)]
    val dimMem = MemoryStream[(Timestamp, Long, String)]
    val events = evMem.toDF().toDF("ev_ts", "entity_id", "action")
      .withWatermark("ev_ts", "10 minutes")
    val dims = dimMem.toDF().toDF("dim_ts", "dim_entity", "name")
      .withWatermark("dim_ts", "10 minutes")
    // enrich: dim update must precede the event by at most 1 hour
    val joined = events.join(dims,
      col("entity_id") === col("dim_entity") &&
        col("dim_ts") <= col("ev_ts") &&
        col("dim_ts") >= col("ev_ts") - expr("INTERVAL 1 HOUR"))
    val out = scala.collection.mutable.ArrayBuffer[(Long, String, String)]()
    val ckpt = Files.createTempDirectory("graft-ssj").toString
    val q = joined.select("entity_id", "action", "name")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        out.synchronized { out ++= rows }
        ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    try {
      dimMem.addData((ts(10, 0), 1L, "alpha"), (ts(10, 0), 2L, "beta"))
      evMem.addData((ts(10, 30), 1L, "update"), // within 1h of dim -> joins
        (ts(10, 30), 3L, "update"))             // no dim -> dropped (inner)
      q.processAllAvailable()
      evMem.addData((ts(11, 30), 2L, "delete")) // dim at 10:00 > 1h old -> dropped
      q.processAllAvailable()
    } finally q.stop()
    assert(out.toSet == Set((1L, "update", "alpha")))
  }
}
