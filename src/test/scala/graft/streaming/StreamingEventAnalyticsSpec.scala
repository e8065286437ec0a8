package graft.streaming

import graft.TestSpark
import graft.operators.EventAnalytics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Batch-parity laws for the streaming retention / transition twins: on
  * an in-order (per user) stream the emissions, aggregated, equal the
  * batch operators exactly, under any micro-batch chunking; each emission
  * happens at most once.
  */
class StreamingEventAnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def collectStream[I <: Product : org.apache.spark.sql.Encoder, O]
      (chunks: Seq[Seq[I]], cols: Seq[String],
       mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Dataset[O])
      : Seq[O] = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[I]
    val all = scala.collection.mutable.ArrayBuffer.empty[O]
    val ckpt = Files.createTempDirectory("graft-sea").toString
    val q = mk(mem.toDF().toDF(cols: _*))
      .writeStream.outputMode(OutputMode.Update)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[O], _: Long) =>
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

  test("retention emissions aggregate to the batch retention grid") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 25).flatMap { u =>
      (1 to 1 + rnd.nextInt(6)).map(_ => (u.toLong, rnd.nextInt(8).toLong))
    }
    // per-user in-order: sort by bucket (the retention "time"), then chunk
    val ordered = rows.sortBy(r => (r._2, r._1))
    for (chunkSize <- Seq(9, ordered.size)) {
      val got = collectStream(ordered.grouped(chunkSize).toSeq,
          Seq("u", "b"),
          (df: org.apache.spark.sql.DataFrame) =>
            StreamingEventAnalytics.retention(df, "u", "b"))
      val pairs = got.map(f => (f.user, f.cohort, f.offset))
      assert(pairs.distinct.size === pairs.size, "duplicate emissions")
      val grid = got.groupBy(f => (f.cohort, f.offset))
        .map { case ((c, o), xs) => (c, o, xs.size.toLong) }.toSet
      val want = EventAnalytics.retention(rows.toDF("u", "b"), "u", "b")
        .as[(Long, Long, Long)].collect().toSet
      assert(grid === want, s"chunkSize=$chunkSize")
    }
  }

  test("transition emissions aggregate to the batch transition counts") {
    val rnd = new scala.util.Random(13)
    val types = Seq("A", "B", "C")
    val rows = (1 to 20).flatMap { u =>
      (1 to 2 + rnd.nextInt(7)).map(i =>
        (u.toLong, i * 10L, types(rnd.nextInt(3))))
    }
    val ordered = rows.sortBy(r => (r._2, r._1))
    for (chunkSize <- Seq(11, ordered.size)) {
      val got = collectStream(ordered.grouped(chunkSize).toSeq,
          Seq("u", "o", "t"),
          (df: org.apache.spark.sql.DataFrame) =>
            StreamingEventAnalytics.transitions(df, "u", "o", "t"))
      val keys = got.map(t => (t.user, t.ord))
      assert(keys.distinct.size === keys.size, "duplicate emissions")
      val counts = got.groupBy(t => (t.from_type, t.to_type))
        .map { case ((f, to), xs) => (f, to, xs.size.toLong) }.toSet
      val want = EventAnalytics.transitions(rows.toDF("u", "o", "t"),
          "u", "t", Seq(col("o")))
        .select("from_type", "to_type", "n")
        .as[(String, String, Long)].collect().toSet
      assert(counts === want, s"chunkSize=$chunkSize")
    }
  }

  test("retention cohort anchors to the first arriving bucket") {
    val got = collectStream(Seq(Seq((1L, 5L)), Seq((1L, 3L), (1L, 9L))),
      Seq("u", "b"),
      (df: org.apache.spark.sql.DataFrame) =>
        StreamingEventAnalytics.retention(df, "u", "b"))
    // bucket 3 arrives AFTER cohort 5 was anchored: negative offset dropped
    // (one-sided late contract), 9 lands at offset 4
    assert(got.map(f => (f.cohort, f.offset)).toSet ===
      Set((5L, 0L), (5L, 4L)))
  }
}
