package graft.streaming

import graft.TestSpark
import graft.functions.KmvSketch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Laws for the streaming KMV sketch:
  *  1. convergence — after the stream drains, the per-key estimate equals
  *     the batch KMV estimate over the same data (sketch-as-state is just
  *     the batch partial aggregate unrolled over time);
  *  2. replay idempotence — re-delivering an entire micro-batch
  *     (at-least-once semantics) leaves every estimate unchanged.
  */
class StreamingKmvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val k = 8

  private def runStream(chunks: Seq[Seq[(String, Long)]],
                        replayLast: Boolean): Map[String, (Int, Long)] = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val latest = scala.collection.mutable.Map[String, (Int, Long)]()
    val ckpt = Files.createTempDirectory("graft-kmv").toString
    val q = StreamingKmv.distinctEstimates(
        mem.toDF().toDF("grp", "uid"), "grp", "uid", k)
      .writeStream.outputMode(StreamingKmv.outputMode)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[StreamingKmv.Estimate], _: Long) =>
          val rows = b.collect()
          latest.synchronized {
            rows.foreach(e => latest(e.key) = (e.n_tracked, e.estimate))
          }
          ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    try {
      chunks.foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      if (replayLast) { mem.addData(chunks.last: _*); q.processAllAvailable() }
    } finally q.stop()
    latest.toMap
  }

  private val data: Seq[Seq[(String, Long)]] = {
    // 2 keys; "a" saturates the k=8 sketch (40 distinct), "b" stays exact
    val a = (1L to 40L).map(i => ("a", i))
    val b = Seq(("b", 100L), ("b", 101L), ("b", 100L))
    Seq(a.take(15) ++ b, a.slice(15, 30), a.drop(30) ++ Seq(("b", 102L)))
  }

  private def batchEstimate(all: Seq[(String, Long)]): Map[String, (Int, Long)] = {
    val agg = new KmvSketch.KmvAgg(k)
    all.groupBy(_._1).map { case (g, rows) =>
      val hashes = spark.createDataset(rows.map(_._2)).toDF("uid")
        .selectExpr("cast(conv(substring(md5(cast(uid as string)), 1, 15), " +
          "16, 10) as bigint) as h")
        .collect().map(_.getLong(0))
      val buf = hashes.foldLeft(agg.zero)(agg.reduce)
      g -> (buf.vals.length, KmvSketch.estimate(buf.vals, k))
    }
  }

  test("streaming estimate converges to the batch sketch over the same data") {
    val streamed = runStream(data, replayLast = false)
    val batch = batchEstimate(data.flatten)
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    // the saturated key really is estimating, the small key is exact
    assert(streamed("a")._1 == k)
    assert(streamed("b") == (3, 3L))
  }

  test("replaying a whole micro-batch leaves estimates unchanged") {
    val once = runStream(data, replayLast = false)
    val replayed = runStream(data, replayLast = true)
    assert(replayed == once, s"replay changed estimates: $replayed vs $once")
  }

  test("null keys and null values are dropped, not query-killing") {
    // (String, String) tuples can carry real nulls; md5(null) -> null hash.
    // Without the na.drop the non-nullable (String, Long) encoder throws and
    // the streaming query dies mid-batch.
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val latest = scala.collection.mutable.Map[String, (Int, Long)]()
    val ckpt = Files.createTempDirectory("graft-kmv-null").toString
    val q = StreamingKmv.distinctEstimates(
        mem.toDF().toDF("grp", "uid"), "grp", "uid", k)
      .writeStream.outputMode(StreamingKmv.outputMode)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[StreamingKmv.Estimate], _: Long) =>
          val rows = b.collect()
          latest.synchronized {
            rows.foreach(e => latest(e.key) = (e.n_tracked, e.estimate))
          }
          ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    try {
      mem.addData(("a", "1"), ("a", null), (null, "2"), ("a", "3"), (null, null))
      q.processAllAvailable()
    } finally q.stop()
    // nulls contribute no distinct value (count(distinct) semantics); the
    // null key never becomes a state key
    assert(latest.toMap == Map("a" -> (2, 2L)), s"got $latest")
  }

  test("sketch state round-trips through the RocksDB provider (100 TB path)") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      graft.GraftSession.RocksDbProvider)
    try {
      // cross-batch convergence proves the Buf (array state) serialized and
      // deserialized through RocksDB's byte store, not just the in-heap map
      val streamed = runStream(data, replayLast = false)
      val batch = batchEstimate(data.flatten)
      assert(streamed == batch, s"rocksdb: streamed=$streamed batch=$batch")
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
