package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Laws for streaming Misra-Gries heavy hitters:
  *  1. cross-batch accumulation — estimates reflect the WHOLE stream, not
  *     the last micro-batch, and on an unsaturated key they are exact;
  *  2. the undercount bound — every estimate is within N_key/(k+1) of the
  *     true count, and every token above the bound is tracked;
  *  3. null hygiene and RocksDB state round-trip.
  */
class StreamingHeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def runStream(chunks: Seq[Seq[(String, String)]], k: Int, m: Int)
      : Map[String, Seq[(Int, String, Long)]] = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val latest = scala.collection.mutable.Map[String, Seq[(Int, String, Long)]]()
    val ckpt = Files.createTempDirectory("graft-shh").toString
    val q = StreamingHeavyHitters.topTokens(
        mem.toDF().toDF("grp", "tok"), "grp", "tok", k, m)
      .writeStream.outputMode(StreamingHeavyHitters.outputMode)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[StreamingHeavyHitters.TopToken], _: Long) =>
          val rows = b.collect()
          latest.synchronized {
            rows.groupBy(_.key).foreach { case (key, ts) =>
              latest(key) = ts.sortBy(_.rank).map(t => (t.rank, t.token, t.est)).toSeq
            }
          }
          ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    try chunks.foreach { c => mem.addData(c: _*); q.processAllAvailable() }
    finally q.stop()
    latest.toMap
  }

  test("unsaturated key: exact counts accumulate across micro-batches") {
    // 3 tokens, k=64 — never prunes, so MG estimates are exact counts
    val b1 = Seq.fill(5)(("a", "x")) ++ Seq.fill(3)(("a", "y"))
    val b2 = Seq.fill(4)(("a", "x")) ++ Seq.fill(6)(("a", "z"))
    val got = runStream(Seq(b1, b2), k = 64, m = 10)
    assert(got("a") == Seq((1, "x", 9L), (2, "z", 6L), (3, "y", 3L)))
  }

  test("saturated key: every token above N/(k+1) is tracked, estimates within bound") {
    // key "s": 3 heavy tokens (60 each) + 300 singleton tail, k=15
    // N = 480, bound = 480/16 = 30 < 60 ⇒ heavies MUST survive
    val heavy = (1 to 3).flatMap(i => Seq.fill(60)(("s", s"hh$i")))
    val tail = (1 to 300).map(i => ("s", s"t$i"))
    val mixed = new scala.util.Random(7).shuffle(heavy ++ tail)
    val chunks = mixed.grouped(120).toSeq
    val got = runStream(chunks, k = 15, m = 15)("s")
    val n = heavy.size + tail.size
    val bound = n / 16
    for (i <- 1 to 3) {
      val est = got.collectFirst { case (_, t, e) if t == s"hh$i" => e }
      assert(est.isDefined, s"hh$i fell out of the summary: $got")
      assert(est.get <= 60L && est.get >= 60L - bound,
        s"hh$i estimate ${est.get} outside [${60L - bound}, 60]")
    }
  }

  test("null keys and tokens are dropped, not query-killing") {
    val got = runStream(Seq(Seq(("a", "x"), ("a", null), (null, "x"),
      (null, null), ("a", "x"))), k = 8, m = 5)
    assert(got == Map("a" -> Seq((1, "x", 2L))), s"got $got")
  }

  test("summary state round-trips through the RocksDB provider (100 TB path)") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      graft.GraftSession.RocksDbProvider)
    try {
      val b1 = Seq.fill(7)(("r", "x")) ++ Seq.fill(2)(("r", "y"))
      val b2 = Seq.fill(5)(("r", "y"))
      val got = runStream(Seq(b1, b2), k = 64, m = 10)
      assert(got("r") == Seq((1, "x", 7L), (2, "y", 7L)))
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
