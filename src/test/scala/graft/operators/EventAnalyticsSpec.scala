package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EventAnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (user, ord, type) — user 1 completes A→B→C in order; user 2 has B
  // before A (B must NOT count); user 3 only reaches A; user 4 re-does A
  // after B, proving earliest-qualifying (min-ord) semantics.
  private def ev = Seq(
    (1L, 10L, "A"), (1L, 20L, "B"), (1L, 30L, "C"),
    (2L, 10L, "B"), (2L, 20L, "A"), (2L, 30L, "C"),
    (3L, 10L, "A"),
    (4L, 10L, "A"), (4L, 20L, "B"), (4L, 30L, "A")
  ).toDF("user_id", "ord", "typ")

  private val steps = Seq(
    "a" -> (col("typ") === "A"),
    "b" -> (col("typ") === "B"),
    "c" -> (col("typ") === "C"))

  test("funnel counts earliest-qualifying progressions") {
    val rows = EventAnalytics.funnel(ev, "user_id", "ord", steps)
      .orderBy("step")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // step a: users 1,2,3,4; step b (B after first A): 1,4; step c: 1
    assert(rows.toSeq === Seq((1L, "a", 4L), (2L, "b", 2L), (3L, "c", 1L)))
    val rates = EventAnalytics.funnel(ev, "user_id", "ord", steps)
      .orderBy("step").collect().map(_.getDouble(3))
    assert(rates.toSeq === Seq(1.0, 0.5, 0.25))
  }

  test("funnelUsers emits the nested reach sets") {
    val got = EventAnalytics.funnelUsers(ev, "user_id", "ord", steps)
      .select("step", "user_id").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 1L), (2L, 4L), (3L, 1L)))
  }

  test("retention counts distinct cohort users per offset") {
    // user 1 first in bucket 0, active 0 and 2; user 2 first in bucket 1,
    // active 1 twice (dedup to one row)
    val b = Seq((1L, 0L), (1L, 2L), (2L, 1L), (2L, 1L))
      .toDF("user_id", "bucket")
    val got = EventAnalytics.retention(b, "user_id", "bucket")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((0L, 0L, 1L), (0L, 2L, 1L), (1L, 0L, 1L)))
  }

  test("robustAnomalies flags > k*MAD departures from the lower median") {
    // series x: values 1,2,3,4,100 → lower med 3, devs 2,1,0,1,97,
    // lower MAD 1 → only 100 beyond 3*1
    val b = Seq(("x", 1L, 1L), ("x", 2L, 2L), ("x", 3L, 3L),
        ("x", 4L, 4L), ("x", 5L, 100L))
      .toDF("k", "ord", "v")
    val got = EventAnalytics.robustAnomalies(b, Seq("k"), "v", "ord")
      .select("ord", "med", "mad", "is_anomaly")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(got === Set((1L, 3L, 1L, false), (2L, 3L, 1L, false),
      (3L, 3L, 1L, false), (4L, 3L, 1L, false), (5L, 3L, 1L, true)))
  }

  test("robustAnomalies lower median on even-sized groups") {
    // n=4 → rank (4+1)/2 = 2 → second-smallest
    val b = Seq(("y", 1L, 10L), ("y", 2L, 20L), ("y", 3L, 30L),
        ("y", 4L, 40L)).toDF("k", "ord", "v")
    val med = EventAnalytics.robustAnomalies(b, Seq("k"), "v", "ord")
      .select("med").distinct().as[Long].collect().toSeq
    assert(med === Seq(20L))
  }

  test("law: user-replication equivariance (counts scale by R, rates invariant)") {
    // clone every user R times with disjoint ids: per-user operators must
    // scale counts EXACTLY by R and leave rates/probabilities unchanged —
    // the replication rehearsal argument (ScaleStressSpec) applied to the
    // event family
    val R = 4
    val rep = (0 until R).map(i =>
        ev.withColumn("user_id", col("user_id") + lit(i * 1000L)))
      .reduce(_ unionByName _)
    val f1 = EventAnalytics.funnel(ev, "user_id", "ord", steps)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSet
    val fR = EventAnalytics.funnel(rep, "user_id", "ord", steps)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSet
    assert(fR === f1.map { case (s, n, c) => (s, n * R, c) })
    val t1 = EventAnalytics.transitions(ev, "user_id", "typ", Seq(col("ord")))
      .as[(String, String, Long, Double)].collect().toSet
    val tR = EventAnalytics.transitions(rep, "user_id", "typ", Seq(col("ord")))
      .as[(String, String, Long, Double)].collect().toSet
    assert(tR === t1.map { case (f, t, n, p) => (f, t, n * R, p) })
  }

  test("transitions counts consecutive pairs with exact probabilities") {
    val got = EventAnalytics.transitions(ev, "user_id", "typ",
        Seq(col("ord")))
      .as[(String, String, Long, Double)].collect().toSet
    // user1: A→B,B→C; user2: B→A,A→C; user3: none; user4: A→B,B→A
    assert(got === Set(
      ("A", "B", 2L, 2.0 / 3.0), ("A", "C", 1L, 1.0 / 3.0),
      ("B", "C", 1L, 1.0 / 3.0), ("B", "A", 2L, 2.0 / 3.0)))
  }
}
