package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Laws for streaming line-level boilerplate removal:
  *  1. prefix-consistency — a line is stripped only from docs arriving
  *     AFTER its df exceeded maxDf; earlier docs keep it;
  *  2. batch-atomicity — verdicts inside one micro-batch don't depend on
  *     intra-batch arrival order (heavy-as-of-batch-start);
  *  3. state idempotence — replaying a whole micro-batch leaves the df
  *     state unchanged (doc-id sets, not counts);
  *  4. reassembly — the foreachBatch companion rebuilds clean docs in
  *     line order.
  */
class StreamingLineDedupeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(batches: Seq[Seq[(Long, String)]],
                  maxDf: Int,
                  replayLast: Boolean = false): Seq[(Long, Int, String, Boolean)] = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = scala.collection.mutable.ArrayBuffer[(Long, Int, String, Boolean)]()
    val ckpt = Files.createTempDirectory("graft-sld").toString
    val q = StreamingLineDedupe.verdicts(
        mem.toDF().toDF("doc_id", "text"), "doc_id", "text", maxDf)
      .writeStream.outputMode("append")
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[StreamingLineDedupe.LineVerdict], _: Long) =>
          val rows = b.collect().map(v => (v.doc_id, v.pos, v.line, v.keep))
          out.synchronized { out ++= rows }
          ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    def await(n: Int): Unit = {
      val deadline = System.currentTimeMillis() + 30000L
      while (System.currentTimeMillis() < deadline &&
             out.synchronized(out.size) < n) Thread.sleep(100L)
    }
    try {
      var expected = 0
      batches.foreach { b =>
        mem.addData(b: _*)
        expected += b.map(_._2.split("\n", -1).length).sum
        await(expected)
      }
      if (replayLast) {
        mem.addData(batches.last: _*)
        expected += batches.last.map(_._2.split("\n", -1).length).sum
        await(expected)
      }
    } finally q.stop()
    out.toList
  }

  private val b1 = Seq(
    (1L, "BANNER\nuniq one"),
    (2L, "BANNER\nuniq two"),
    (3L, "BANNER\nuniq three")) // df(BANNER) saturates past maxDf=2
  private val b2 = Seq(
    (4L, "BANNER\nuniq four"),
    (5L, "all fresh"))

  test("prefix-consistency: early copies keep, post-saturation copies drop") {
    val out = run(Seq(b1, b2), maxDf = 2)
    val banner = out.filter(_._3 == "BANNER").map(v => (v._1, v._4)).toMap
    // batch 1 arrived before the df exceeded maxDf -> keep
    assert(banner(1L) && banner(2L) && banner(3L))
    // batch 2 doc sees the saturated state -> drop
    assert(!banner(4L))
    // every non-banner line keeps everywhere
    assert(out.filterNot(_._3 == "BANNER").forall(_._4))
  }

  test("batch-atomicity: intra-batch order does not split a batch's verdicts") {
    // all 3 banner copies in ONE batch with maxDf=1: heavy-at-start is
    // false for the whole batch, so all keep (and the state saturates for
    // any later batch)
    val out = run(Seq(b1), maxDf = 1)
    assert(out.filter(_._3 == "BANNER").forall(_._4))
  }

  test("state idempotence: replaying a micro-batch flips no earlier verdict " +
       "and the replayed docs get the saturated verdict") {
    val out = run(Seq(b1, b2), maxDf = 2, replayLast = true)
    // first delivery of batch 2: doc 4's banner dropped; the replay emits
    // doc 4 again with the same (still-saturated) verdict
    val banner4 = out.filter(v => v._1 == 4L && v._3 == "BANNER").map(_._4)
    assert(banner4.length == 2 && banner4.forall(!_))
    // batch-1 verdicts were emitted once, unchanged
    assert(out.count(v => v._1 <= 3L && v._3 == "BANNER") == 3)
  }

  test("cross-batch df state survives the RocksDB provider (100 TB path)") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      graft.GraftSession.RocksDbProvider)
    try {
      val out = run(Seq(b1, b2), maxDf = 2)
      val banner = out.filter(_._3 == "BANNER").map(v => (v._1, v._4)).toMap
      assert(banner(1L) && banner(2L) && banner(3L) && !banner(4L))
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("reassemble rebuilds clean docs in line order per batch") {
    val verdicts = Seq(
      (7L, 0, "keep a", true), (7L, 1, "BANNER", false), (7L, 2, "keep b", true),
      (8L, 0, "BANNER", false))
      .toDF("doc_id", "pos", "line", "keep")
    val got = StreamingLineDedupe.reassemble(verdicts)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(got(0) == ((7L, "keep a\nkeep b", 2L, 1L)))
    assert(got(1) == ((8L, "", 0L, 1L)))
  }
}
