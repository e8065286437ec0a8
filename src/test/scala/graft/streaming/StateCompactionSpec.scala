package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streaming log compaction: per key, only advancing versions emit changelog
  * rows; replays and out-of-order older versions are swallowed.
  *
  * Runs under BOTH state-store providers (default HDFS-backed and RocksDB)
  * so the per-key latest-version state is proven through a real off-heap
  * byte store as well as the in-heap map.
  */
class StateCompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import StateCompaction.{Latest, Version}

  for ((label, provider) <- Seq(
      ("hdfs", None),
      ("rocksdb", Some(graft.GraftSession.RocksDbProvider)))) {

    test(s"emits only advancing versions across batches; replay-safe [$label]") {
      implicit val sq = spark.sqlContext
      provider.foreach(p =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p))
      try {
        val mem = MemoryStream[Version]
        val out = scala.collection.mutable.ArrayBuffer[Latest]()
        val ckpt = Files.createTempDirectory("graft-compact").toString
        val q = StateCompaction(mem.toDS())
          .writeStream.outputMode("append")
          .foreachBatch { (b: org.apache.spark.sql.Dataset[Latest], _: Long) =>
            val rows = b.collect()
            out.synchronized { out ++= rows }
            ()
          }
          .trigger(Trigger.ProcessingTime(50L))
          .option("checkpointLocation", ckpt)
          .start()
        try {
          // batch 1: keys 1 and 2; key 1 has two versions in one batch
          mem.addData(Version(1L, 10L, "a1"), Version(1L, 20L, "a2"), Version(2L, 5L, "b1"))
          q.processAllAvailable()
          val b1 = out.synchronized(out.toSet)
          assert(b1 == Set(Latest(1L, 20L, "a2"), Latest(2L, 5L, "b1")))

          // batch 2: replay of (1,20), an OLDER version of 2, and an advance of 2
          mem.addData(Version(1L, 20L, "a2"), Version(2L, 3L, "b0"), Version(2L, 9L, "b2"))
          q.processAllAvailable()
          val b2 = out.synchronized(out.toSet).diff(b1)
          assert(b2 == Set(Latest(2L, 9L, "b2"))) // key 1 unchanged, key 2 advanced

          // batch 3: strictly older data only -> nothing emitted
          mem.addData(Version(1L, 1L, "a0"), Version(2L, 2L, "b-1"))
          q.processAllAvailable()
          assert(out.synchronized(out.size) == 3)
        } finally q.stop()
      } finally provider.foreach(_ =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass"))
    }
  }
}
