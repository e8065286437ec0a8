package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Count-or-time buffer: count arm flushes inline at exactly maxCount
  * deduped ids; time arm flushes the remainder via the state timeout on a
  * subsequent (possibly empty) trigger.
  *
  * An explicit ProcessingTime trigger paces the stream — with the default
  * best-effort trigger, timeout-check batches run back-to-back and
  * `processAllAvailable` races the continuous empty batches. Results are
  * awaited by deadline-polling the collected output instead.
  */
class CountOrTimeBufferSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(dwellMillis: Long,
                  feed: MemoryStream[(String, Int)] => Unit)(
                  done: Seq[CountOrTimeBuffer.Flush] => Boolean): Seq[CountOrTimeBuffer.Flush] = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, Int)]
    val out = scala.collection.mutable.ArrayBuffer[CountOrTimeBuffer.Flush]()
    val ckpt = Files.createTempDirectory("graft-cotb").toString
    val q = CountOrTimeBuffer(mem.toDS(), maxCount = 3, dwellMillis = dwellMillis)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[CountOrTimeBuffer.Flush], _: Long) =>
        val rows = b.collect()
        out.synchronized { out ++= rows }
        ()
      }
      .trigger(Trigger.ProcessingTime(100L))
      .option("checkpointLocation", ckpt)
      .start()
    try {
      feed(mem)
      val deadline = System.currentTimeMillis() + 30000L
      while (System.currentTimeMillis() < deadline &&
             !done(out.synchronized(out.toSeq))) Thread.sleep(100L)
    } finally q.stop()
    out.synchronized(out.toSeq)
  }

  test("count arm: flush at exactly maxCount deduped ids, keep-first order") {
    val flushes = run(dwellMillis = 120000L,
      mem => mem.addData(("t1", 1), ("t1", 2), ("t1", 1), ("t1", 3), ("t1", 4),
        ("t1", 5)))(_.nonEmpty)
    assert(flushes == Seq(CountOrTimeBuffer.Flush("t1", Seq(1, 2, 3), "count")))
  }

  test("time arm: dwell expiry flushes the buffered remainder") {
    val flushes = run(dwellMillis = 500L,
      mem => mem.addData(("t1", 1), ("t1", 2)))(
      _.exists(_.reason == "time"))
    assert(flushes.contains(CountOrTimeBuffer.Flush("t1", Seq(1, 2), "time")))
  }

  test("independent keys buffer independently") {
    val flushes = run(dwellMillis = 120000L,
      mem => mem.addData(("a", 1), ("b", 1), ("a", 2), ("b", 2), ("a", 3),
        ("b", 3), ("a", 3), ("b", 1)))(_.size >= 2)
    assert(flushes.toSet == Set(
      CountOrTimeBuffer.Flush("a", Seq(1, 2, 3), "count"),
      CountOrTimeBuffer.Flush("b", Seq(1, 2, 3), "count")))
  }
}
