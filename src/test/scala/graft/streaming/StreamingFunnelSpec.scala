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

  /** Feed chunks to the BUFFERED variant; return every emission. */
  private def runBuffered(chunks: Seq[Seq[(Long, Long, Int)]], nSteps: Int,
                          delay: String, ttlMs: Option[Long] = None)
      : Seq[StreamingFunnel.StepReached] = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Int)]
    val all = scala.collection.mutable.ArrayBuffer
      .empty[StreamingFunnel.StepReached]
    val ckpt = Files.createTempDirectory("graft-sfb").toString
    val q = StreamingFunnel.reachBuffered(
        mem.toDF().toDF("u", "o", "s"), "u", "o", "s", nSteps, delay, ttlMs)
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

  test("buffered variant: OUT-OF-ORDER delivery still matches batch exactly") {
    // user 1's steps arrive in REVERSE order across batches — the delivery
    // pattern the processing-order twin documents as under-counting; the
    // watermark buffer (5 s delay covers the 4 s disorder) must absorb it.
    // Sentinels on user 99 advance the watermark past every real event.
    val real = Seq((1L, 2000L, 0), (1L, 4000L, 1), (1L, 6000L, 2))
    val chunks = Seq(
      Seq((1L, 6000L, 2), (1L, 4000L, 1)), // later steps first
      Seq((1L, 2000L, 0)),                 // step 1 arrives last
      Seq((99L, 20000L, 0)),               // watermark → 15000
      Seq((99L, 30000L, 0)))               // fires the flush timeouts
    val got = runBuffered(chunks, nSteps = 3, delay = "5 seconds")
      .filter(_.user == 1L).map(r => (r.user, r.step, r.first_ord)).toSet
    assert(got === batchReach(real, 3).map { case (u, s, o) => (u, s, o) })
    assert(got === Set((1L, 1, 2000L), (1L, 2, 4000L), (1L, 3, 6000L)))
  }

  test("buffered variant: batch parity on a shuffled random stream") {
    val rnd = new scala.util.Random(29)
    val events = (1 to 15).flatMap { u =>
      (1 to 8).map(i => (u.toLong, i * 1000L + rnd.nextInt(3), rnd.nextInt(4)))
    }
    // deliver in RANDOM order; disorder is bounded by the full span (24 s),
    // so a 30 s delay makes the buffered fold equal batch exactly
    val shuffled = rnd.shuffle(events)
    val sentinel = Seq((999L, 200000L, 0))
    val got = runBuffered(
        shuffled.grouped(23).toSeq ++ Seq(sentinel, sentinel),
        nSteps = 3, delay = "30 seconds")
      .filter(_.user != 999L).map(r => (r.user, r.step, r.first_ord)).toSet
    assert(got === batchReach(events, 3))
  }

  test("buffered variant: event-time TTL drops idle state deterministically") {
    // step-1 completion flushes, then the watermark runs TTL past the
    // user's last event → state dropped → a LATER step-0 event re-emits
    // step 1 (progression forgotten), which cannot happen without TTL
    val chunks = Seq(
      Seq((1L, 1000L, 0)),
      Seq((99L, 20000L, 0)),  // wm → 15000: flush 1000, TTL 1000+3000 < wm
      Seq((99L, 30000L, 0)),  // timeout fires → state removed
      Seq((1L, 26000L, 0)),   // same user restarts from step 1
      Seq((99L, 90000L, 0)),
      Seq((99L, 99000L, 0)))
    val got = runBuffered(chunks, nSteps = 2, delay = "5 seconds",
        ttlMs = Some(3000L))
      .filter(_.user == 1L).map(r => (r.step, r.first_ord))
    assert(got === Seq((1, 1000L), (1, 26000L)),
      s"expected a TTL-forced funnel restart, got $got")
    // control: without TTL the second step-0 event is a no-op
    val got2 = runBuffered(chunks, nSteps = 2, delay = "5 seconds")
      .filter(_.user == 1L).map(r => (r.step, r.first_ord))
    assert(got2 === Seq((1, 1000L)))
  }

  test("processing-time TTL on the in-order twin drops idle state") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Int)]
    val all = scala.collection.mutable.ArrayBuffer
      .empty[StreamingFunnel.StepReached]
    val ckpt = Files.createTempDirectory("graft-sft").toString
    val q = StreamingFunnel.reach(
        mem.toDF().toDF("u", "o", "s"), "u", "o", "s", nSteps = 2,
        idleTtl = Some("1 millisecond"))
      .writeStream.outputMode(OutputMode.Update)
      // a real trigger interval: ProcessingTimeTimeout makes Spark schedule
      // no-data micro-batches CONTINUOUSLY (each batch may have expirable
      // timers), which also starves processAllAvailable's no-new-data
      // signal — so this test paces batches and POLLS emissions instead
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("50 milliseconds"))
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[StreamingFunnel.StepReached],
         _: Long) =>
          val rows = b.collect()
          all.synchronized { all ++= rows }
          ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    def awaitRows(n: Int): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (all.synchronized(all.size) < n &&
             System.currentTimeMillis() < deadline) Thread.sleep(25)
      assert(all.synchronized(all.size) >= n,
        s"timed out waiting for $n emissions, have ${all.synchronized(all.toSeq)}")
    }
    try {
      mem.addData((1L, 10L, 0)); awaitRows(1)
      Thread.sleep(300) // let the 1 ms TTL expire in wall-clock time
      mem.addData((50L, 10L, 0)); awaitRows(2) // a batch fires the timeout
      mem.addData((1L, 99L, 0)); awaitRows(3)  // user 1 restarts from step 1
    } finally q.stop()
    val u1 = all.filter(_.user == 1L).map(r => (r.step, r.first_ord)).toSeq
    assert(u1 === Seq((1, 10L), (1, 99L)),
      s"expected TTL-forced restart for user 1, got $u1")
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
