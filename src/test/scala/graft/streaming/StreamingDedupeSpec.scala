package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files
import java.sql.Timestamp

/** Streaming content dedupe: cross-batch suppression keyed on content, not
  * entity id — first arrival wins, later near-identical documents flagged.
  */
class StreamingDedupeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val textA = "the quick brown fox jumps over the lazy dog again and again"
  private val textB = "completely different content about spark execution plans here"
  private val textC = "unrelated third document text mentioning shuffles and joins only"

  test("exactSimhash drops an equal-fingerprint doc arriving in a later batch") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val docs = mem.toDF().toDF("event_time", "doc_id", "text")
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    val ckpt = Files.createTempDirectory("graft-sd").toString
    val q = StreamingDedupe.exactSimhash(docs, "text", "event_time", "10 minutes")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.select("doc_id").collect().map(_.getLong(0))
        out.synchronized { out ++= rows }
        ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    try {
      mem.addData((ts(0), 1L, textA), (ts(0), 2L, textB))
      q.processAllAvailable()
      // doc 3 repeats doc 1's text verbatim -> same simhash -> suppressed
      mem.addData((ts(1), 3L, textA), (ts(1), 4L, textC))
      q.processAllAvailable()
    } finally q.stop()
    assert(out.sorted.toSeq == Seq(1L, 2L, 4L))
  }

  test("simhashBandFlags: exact repeat flagged in every band, fresh docs first everywhere") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val out = scala.collection.mutable.ArrayBuffer[(Long, Int, Boolean)]()
    val ckpt = Files.createTempDirectory("graft-sb").toString
    val q = StreamingDedupe.simhashBandFlags(docs, "doc_id", "text", maxDist = 3)
      .writeStream.outputMode("append")
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[StreamingDedupe.BandVerdict], _: Long) =>
          val rows = b.collect().map(v => (v.doc_id, v.band, v.is_first))
          out.synchronized { out ++= rows }
          ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()
    // deadline-poll: processAllAvailable races the continuous empty
    // timeout-check batches of flatMapGroupsWithState and never returns
    def await(n: Int): Unit = {
      val deadline = System.currentTimeMillis() + 30000L
      while (System.currentTimeMillis() < deadline &&
             out.synchronized(out.size) < n) Thread.sleep(100L)
    }
    try {
      mem.addData((1L, textA), (2L, textB))
      await(8) // 2 docs x 4 bands
      // batch 2: doc 3 = doc 1's text (hamming 0 <= 3 -> near in all 4
      // bands); doc 4 fresh
      mem.addData((3L, textA), (4L, textC))
      await(16)
    } finally q.stop()
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(v => v._3)).toMap
    // every doc gets one verdict per band (maxDist+1 = 4)
    assert(out.groupBy(_._1).forall(_._2.map(_._2).sorted == Seq(0, 1, 2, 3)))
    assert(byDoc(1L).forall(identity) && byDoc(2L).forall(identity) &&
      byDoc(4L).forall(identity))
    assert(byDoc(3L).forall(v => !v)) // candidate: flagged in ALL bands here
  }

  test("simhashBandFlags: null-text rows are dropped, not query-killing") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val out = scala.collection.mutable.ArrayBuffer[(Long, Int, Boolean)]()
    val ckpt = Files.createTempDirectory("graft-sbn").toString
    val q = StreamingDedupe.simhashBandFlags(docs, "doc_id", "text", maxDist = 3)
      .writeStream.outputMode("append")
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[StreamingDedupe.BandVerdict], _: Long) =>
          val rows = b.collect().map(v => (v.doc_id, v.band, v.is_first))
          out.synchronized { out ++= rows }
          ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()
    def await(n: Int): Unit = {
      val deadline = System.currentTimeMillis() + 30000L
      while (System.currentTimeMillis() < deadline &&
             out.synchronized(out.size) < n) Thread.sleep(100L)
    }
    try {
      mem.addData((1L, textA), (2L, null))
      await(4) // doc 1 x 4 bands; the null-text row must not kill the query
    } finally q.stop()
    val docsSeen = out.synchronized(out.map(_._1).toSet)
    assert(docsSeen == Set(1L), s"got $docsSeen")
  }

  test("simhashBandFlags: within-batch first arrival wins deterministically by id") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val out = scala.collection.mutable.ArrayBuffer[(Long, Int, Boolean)]()
    val ckpt = Files.createTempDirectory("graft-sb2").toString
    val q = StreamingDedupe.simhashBandFlags(docs, "doc_id", "text", maxDist = 1)
      .writeStream.outputMode("append")
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[StreamingDedupe.BandVerdict], _: Long) =>
          val rows = b.collect().map(v => (v.doc_id, v.band, v.is_first))
          out.synchronized { out ++= rows }
          ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()
    try {
      // same text twice in ONE batch: lower id is first, higher id flagged
      mem.addData((8L, textA), (5L, textA))
      val deadline = System.currentTimeMillis() + 30000L
      while (System.currentTimeMillis() < deadline &&
             out.synchronized(out.size) < 4) Thread.sleep(100L)
    } finally q.stop()
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(_._3)).toMap
    assert(byDoc(5L).forall(identity))
    assert(byDoc(8L).forall(v => !v))
  }

  test("cross-batch state survives under the RocksDB provider (off-heap " +
       "state — the 100 TB scale path)") {
    implicit val sq = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      graft.GraftSession.RocksDbProvider)
    try {
      val mem = MemoryStream[(Timestamp, Long, String)]
      val docs = mem.toDF().toDF("event_time", "doc_id", "text")
      val out = scala.collection.mutable.ArrayBuffer[Long]()
      val ckpt = Files.createTempDirectory("graft-sd-rocks").toString
      val q = StreamingDedupe.exactSimhash(docs, "text", "event_time", "10 minutes")
        .writeStream.outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = b.select("doc_id").collect().map(_.getLong(0))
          out.synchronized { out ++= rows }
          ()
        }
        .option("checkpointLocation", ckpt)
        .start()
      def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
      try {
        mem.addData((ts(0), 1L, textA), (ts(0), 2L, textB))
        q.processAllAvailable()
        // the repeat arrives in a LATER batch: suppression proves the
        // fingerprint state persisted across batches inside RocksDB
        mem.addData((ts(1), 3L, textA), (ts(1), 4L, textC))
        q.processAllAvailable()
      } finally q.stop()
      assert(out.sorted.toSeq == Seq(1L, 2L, 4L))
      // the provider actually engaged: RocksDB leaves its own artifacts
      // (sst/zip/changelog) in the state dir, which the HDFS provider never
      // writes
      val stateDir = java.nio.file.Paths.get(ckpt, "state")
      val rocksArtifacts = java.nio.file.Files.walk(stateDir)
        .filter(p => { val n = p.getFileName.toString
          n.endsWith(".zip") || n.endsWith(".sst") || n.endsWith(".changelog") })
        .count()
      assert(rocksArtifacts > 0, "no RocksDB state artifacts under " + stateDir)
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
