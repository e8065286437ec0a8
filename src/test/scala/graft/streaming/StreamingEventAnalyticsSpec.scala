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

  test("transitions tiebreak: same-ord events fold in batch's (ord, tb) order") {
    // two same-ord events for one user — without a tiebreak the pairing is
    // nondeterministic; with one it must equal the batch twin's
    // ordCols = (o, tb) exactly (ADVICE round-7)
    val rows = Seq((1L, 10L, 1L, "A"), (1L, 20L, 2L, "C"), (1L, 20L, 1L, "B"),
      (1L, 30L, 1L, "D"))
    for (chunkSize <- Seq(1, 2, rows.size)) {
      val got = collectStream(rows.sortBy(r => (r._2, r._3)).grouped(chunkSize).toSeq,
          Seq("u", "o", "tb", "t"),
          (df: org.apache.spark.sql.DataFrame) =>
            StreamingEventAnalytics.transitions(df, "u", "o", "t",
              tiebreakCol = Some("tb")))
      val want = EventAnalytics.transitions(
          rows.toDF("u", "o", "tb", "t"), "u", "t",
          Seq(col("o"), col("tb")))
        .select("from_type", "to_type", "n")
        .as[(String, String, Long)].collect().toSet
      val counts = got.groupBy(t => (t.from_type, t.to_type))
        .map { case ((f, to), xs) => (f, to, xs.size.toLong) }.toSet
      assert(counts === want, s"chunkSize=$chunkSize")
      assert(counts === Set(("A", "B", 1L), ("B", "C", 1L), ("C", "D", 1L)))
    }
  }

  test("buffered transitions: out-of-order delivery matches batch exactly") {
    val rnd = new scala.util.Random(31)
    val types = Seq("A", "B", "C")
    val rows = (1 to 12).flatMap { u =>
      (1 to 2 + rnd.nextInt(6)).map(i =>
        (u.toLong, i * 1000L, 0L, types(rnd.nextInt(3))))
    }
    val sentinel = Seq((999L, 500000L, 0L, "A"))
    val got = collectStream(
        rnd.shuffle(rows).grouped(17).toSeq ++ Seq(sentinel, sentinel),
        Seq("u", "o", "tb", "t"),
        (df: org.apache.spark.sql.DataFrame) =>
          StreamingEventAnalytics.transitionsBuffered(df, "u", "o", "t",
            delay = "60 seconds"))
      .filter(_.user != 999L)
    val keys = got.map(t => (t.user, t.ord))
    assert(keys.distinct.size === keys.size, "duplicate emissions")
    val counts = got.groupBy(t => (t.from_type, t.to_type))
      .map { case ((f, to), xs) => (f, to, xs.size.toLong) }.toSet
    val want = EventAnalytics.transitions(rows.toDF("u", "o", "tb", "t"),
        "u", "t", Seq(col("o")))
      .select("from_type", "to_type", "n")
      .as[(String, String, Long)].collect().toSet
    assert(counts === want)
  }

  test("buffered retention: a late-arriving EARLIER bucket still anchors the cohort") {
    // bucket 3 (ord 3000) arrives AFTER bucket 5 (ord 5000) — the
    // processing-order twin mis-anchors to 5 (pinned by the cohort test
    // below); the watermark buffer must anchor to 3, matching batch
    val chunks = Seq(
      Seq((1L, 5000L, 5L)),
      Seq((1L, 3000L, 3L), (1L, 9000L, 9L)),
      Seq((99L, 500000L, 0L)),
      Seq((99L, 900000L, 0L)))
    val got = collectStream(chunks, Seq("u", "o", "b"),
        (df: org.apache.spark.sql.DataFrame) =>
          StreamingEventAnalytics.retentionBuffered(df, "u", "o", "b",
            delay = "10 seconds"))
      .filter(_.user == 1L)
    assert(got.map(f => (f.cohort, f.offset)).toSet ===
      Set((3L, 0L), (3L, 2L), (3L, 6L)))
    val want = EventAnalytics.retention(
        Seq((1L, 5L), (1L, 3L), (1L, 9L)).toDF("u", "b"), "u", "b")
      .as[(Long, Long, Long)].collect()
      .map { case (c, o, _) => (c, o) }.toSet
    assert(got.map(f => (f.cohort, f.offset)).toSet === want)
  }

  test("buffered retention: event-time TTL re-anchors a returning user") {
    val chunks = Seq(
      Seq((1L, 1000L, 1L)),
      Seq((99L, 200000L, 0L)),  // wm → 190000: flush, then TTL expires state
      Seq((99L, 300000L, 0L)),
      Seq((1L, 400000L, 400L)), // returning user: fresh cohort anchor
      Seq((99L, 900000L, 0L)),
      Seq((99L, 990000L, 0L)))
    val got = collectStream(chunks, Seq("u", "o", "b"),
        (df: org.apache.spark.sql.DataFrame) =>
          StreamingEventAnalytics.retentionBuffered(df, "u", "o", "b",
            delay = "5 seconds", idleTtlMs = Some(3000L)))
      .filter(_.user == 1L)
    assert(got.map(f => (f.cohort, f.offset)).toSeq ===
      Seq((1L, 0L), (400L, 0L)),
      s"expected a TTL re-anchor, got $got")
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
