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
  *
  * Every test runs under BOTH state-store providers — default HDFS-backed
  * (in-heap map) and RocksDB (off-heap byte store, the 100 TB scale path) —
  * so the keyed buffer state is proven to serialize through a real byte
  * store, not just the heap.
  */
class CountOrTimeBufferSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(dwellMillis: Long, provider: Option[String],
                  feed: MemoryStream[(String, Int)] => Unit)(
                  done: Seq[CountOrTimeBuffer.Flush] => Boolean): Seq[CountOrTimeBuffer.Flush] = {
    implicit val sq = spark.sqlContext
    provider.foreach(p =>
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", p))
    try {
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
    } finally provider.foreach(_ =>
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass"))
  }

  for ((label, provider) <- Seq(
      ("hdfs", None),
      ("rocksdb", Some(graft.GraftSession.RocksDbProvider)))) {

    test(s"count arm: flush at exactly maxCount deduped ids, keep-first order [$label]") {
      val flushes = run(dwellMillis = 120000L, provider,
        mem => mem.addData(("t1", 1), ("t1", 2), ("t1", 1), ("t1", 3), ("t1", 4),
          ("t1", 5)))(_.nonEmpty)
      assert(flushes == Seq(CountOrTimeBuffer.Flush("t1", Seq(1, 2, 3), "count")))
    }

    test(s"time arm: dwell expiry flushes the buffered remainder [$label]") {
      val flushes = run(dwellMillis = 500L, provider,
        mem => mem.addData(("t1", 1), ("t1", 2)))(
        _.exists(_.reason == "time"))
      assert(flushes.contains(CountOrTimeBuffer.Flush("t1", Seq(1, 2), "time")))
    }

    test(s"independent keys buffer independently [$label]") {
      val flushes = run(dwellMillis = 120000L, provider,
        mem => mem.addData(("a", 1), ("b", 1), ("a", 2), ("b", 2), ("a", 3),
          ("b", 3), ("a", 3), ("b", 1)))(_.size >= 2)
      assert(flushes.toSet == Set(
        CountOrTimeBuffer.Flush("a", Seq(1, 2, 3), "count"),
        CountOrTimeBuffer.Flush("b", Seq(1, 2, 3), "count")))
    }
  }
}
