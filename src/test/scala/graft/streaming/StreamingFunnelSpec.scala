package graft.streaming

import graft.TestSpark
import graft.operators.EventAnalytics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Laws for the streaming funnel:
  *  1. BATCH PARITY — on an in-order (per user) stream, the union of all
  *     emissions equals the batch `funnelUsers` reach set exactly, however
  *     the stream is chunked into micro-batches;
  *  2. monotone emission — every (user, step) pair is emitted at most once
  *     across the whole stream;
  *  3. strictly-after tie rejection matches batch;
  *  4. state round-trips through the RocksDB provider.
  */
class StreamingFunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Feed (user, ord, step) rows in `chunks`; return every emission. */
  private def runStream(chunks: Seq[Seq[(Long, Long, Int)]], nSteps: Int)
      : Seq[StreamingFunnel.StepReached] = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Int)]
    val all = scala.collection.mutable.ArrayBuffer
      .empty[StreamingFunnel.StepReached]
    val ckpt = Files.createTempDirectory("graft-sfn").toString
    val q = StreamingFunnel.reach(
        mem.toDF().toDF("u", "o", "s"), "u", "o", "s", nSteps)
      .writeStream.outputMode(OutputMode.Update)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[StreamingFunnel.StepReached],
         _: Long) =>
          val rows = b.collect()
          all.synchronized { all ++= rows }
          ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    try chunks.foreach { c => mem.addData(c: _*); q.processAllAvailable() }
    finally q.stop()
    all.toSeq
  }

  private def batchReach(rows: Seq[(Long, Long, Int)], nSteps: Int)
      : Set[(Long, Int, Long)] = {
    val df = rows.toDF("u", "o", "s")
    val steps = (0 until nSteps).map(i => s"st$i" -> (col("s") === i))
    EventAnalytics.funnelUsers(df, "u", "o", steps)
      .select(col("step").cast("int"), col("u"), col("first_ord"))
      .as[(Int, Long, Long)].collect()
      .map { case (st, u, o) => (u, st, o) }.toSet
  }

  test("batch parity on a deterministic random stream, any chunking") {
    val rnd = new scala.util.Random(11)
    // 30 users, ~12 events each, 3 steps + a noise step index out of range
    val events = (1 to 30).flatMap { u =>
      val n = 6 + rnd.nextInt(8)
      (1 to n).map(i => (u.toLong, i * 10L + rnd.nextInt(5), rnd.nextInt(4)))
    }
    // per-user in-order delivery: sort globally by ord, then chunk
    val ordered = events.sortBy(e => (e._2, e._1))
    for (chunkSize <- Seq(7, 50, ordered.size)) {
      val got = runStream(ordered.grouped(chunkSize).toSeq, nSteps = 3)
        .map(r => (r.user, r.step, r.first_ord)).toSet
      assert(got === batchReach(events, 3), s"chunkSize=$chunkSize")
    }
  }

  test("each (user, step) emitted at most once across batches") {
    val evs = Seq((1L, 10L, 0), (1L, 20L, 1), (1L, 30L, 0), (1L, 40L, 1),
      (1L, 50L, 2))
    val got = runStream(evs.grouped(2).toSeq, nSteps = 3)
    val pairs = got.map(r => (r.user, r.step))
    assert(pairs.distinct.size === pairs.size, s"duplicates in $got")
    assert(got.map(r => (r.step, r.first_ord)).toSet ===
      Set((1, 10L), (2, 20L), (3, 50L)))
  }

  test("same-ord step events reject strictly-after, matching batch") {
    val evs = Seq((1L, 10L, 0), (1L, 10L, 1), (1L, 20L, 1))
    val got = runStream(Seq(evs), nSteps = 2)
      .map(r => (r.step, r.first_ord)).toSet
    assert(got === Set((1, 10L), (2, 20L)))
    assert(got === batchReach(evs, 2).map { case (_, s, o) => (s, o) })
  }

  test("state round-trips through the RocksDB provider (100 TB path)") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      graft.GraftSession.RocksDbProvider)
    try {
      val b1 = Seq((9L, 10L, 0))
      val b2 = Seq((9L, 20L, 1), (9L, 30L, 2))
      val got = runStream(Seq(b1, b2), nSteps = 3)
        .map(r => (r.step, r.first_ord)).toSet
      assert(got === Set((1, 10L), (2, 20L), (3, 30L)))
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
