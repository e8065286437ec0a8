package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sessionize laws: session boundaries exactly where gap > threshold,
  * session ids dense per key, stats conserve events.
  */
class SessionizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val gap = 100L

  test("sessions split exactly at gaps greater than the threshold") {
    // key 1: ts 0,50,150(gap=100, NOT new),251(gap=101 -> new),260
    val ev = Seq((1L, 0L, 1L), (1L, 50L, 2L), (1L, 150L, 3L),
        (1L, 251L, 4L), (1L, 260L, 5L), (2L, 0L, 6L))
      .toDF("k", "ts_us", "eid")
    val out = Sessionize.assign(ev, Seq("k"), col("ts_us"), gap, col("eid"))
      .select($"eid", $"session_id").as[(Long, Long)].collect().toMap
    assert(out(1L) == 1 && out(2L) == 1 && out(3L) == 1) // gap == 100 stays
    assert(out(4L) == 2 && out(5L) == 2)                 // gap 101 splits
    assert(out(6L) == 1)                                  // new key restarts
  }

  test("stats conserve events and bounds bracket members") {
    val rnd = new scala.util.Random(3)
    val ev = (0 until 500).map(i =>
        (rnd.nextInt(5).toLong, rnd.nextInt(100000).toLong, i.toLong))
      .toDF("k", "ts_us", "eid")
    val st = Sessionize.stats(ev, Seq("k"), col("ts_us"), gap, col("eid"))
    assert(st.agg(sum("n_events")).as[Long].head() == 500L)
    // bounds: start <= end, and sessions of one key don't overlap
    val rows = st.select($"k", $"session_id", $"start_us", $"end_us")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.forall(r => r._3 <= r._4))
    rows.groupBy(_._1).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 + gap < b._3 + gap + 1 && a._4 < b._3)
        case _ =>
      }
    }
  }

  test("session ids are dense starting at 1 per key") {
    val ev = Seq((1L, 0L, 1L), (1L, 500L, 2L), (1L, 1000L, 3L))
      .toDF("k", "ts_us", "eid")
    val ids = Sessionize.assign(ev, Seq("k"), col("ts_us"), gap, col("eid"))
      .select($"session_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L))
  }
}
