package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RangeJoin laws vs brute-force BETWEEN join on random data, across bucket
  * widths (result must be bucket-width invariant).
  */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val points = {
    val rnd = new scala.util.Random(5)
    (0 until 400).map(i => (i.toLong, rnd.nextInt(10000).toLong)).toDF("pid", "x")
  }
  private lazy val intervals = {
    val rnd = new scala.util.Random(6)
    (0 until 60).map { i =>
      val lo = rnd.nextInt(10000).toLong
      (i.toLong, lo, lo + rnd.nextInt(500).toLong)
    }.toDF("iid", "lo", "hi")
  }

  private def bruteForce: Set[(Long, Long)] =
    points.crossJoin(intervals)
      .filter($"x" >= $"lo" && $"x" <= $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet

  test("pointInInterval equals brute-force across bucket widths") {
    val expect = bruteForce
    for (b <- Seq(7L, 100L, 1000L, 100000L)) {
      val got = RangeJoin.pointInInterval(points, $"x", intervals, $"lo", $"hi", b)
        .select($"pid", $"iid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"duplicates at bucket=$b")
      assert(got.toSet == expect, s"mismatch at bucket=$b")
    }
  }

  test("intervalOverlap equals brute-force and emits each pair once") {
    val a = intervals.select($"iid".as("aid"), $"lo".as("alo"), $"hi".as("ahi"))
    val b = intervals.select($"iid".as("bid"), $"lo".as("blo"), $"hi".as("bhi"))
    val expect = a.crossJoin(b)
      .filter($"alo" <= $"bhi" && $"blo" <= $"ahi")
      .select($"aid", $"bid").as[(Long, Long)].collect().toSet
    for (w <- Seq(64L, 500L, 10000L)) {
      val got = RangeJoin.intervalOverlap(a, $"alo", $"ahi", b, $"blo", $"bhi", w)
        .select($"aid", $"bid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"duplicates at bucket=$w")
      assert(got.toSet == expect, s"mismatch at bucket=$w")
    }
  }

  test("dirty intervals (hi < lo, NULL bound) match nothing instead of throwing") {
    val dirty = intervals.union(
      Seq((500L, 9000L, 100L)).toDF("iid", "lo", "hi")) // inverted
      .union(spark.sql("SELECT 501 AS iid, 10 AS lo, CAST(NULL AS BIGINT) AS hi"))
    val got = RangeJoin.pointInInterval(points, $"x", dirty, $"lo", $"hi", 100L)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(got == bruteForce) // dirty rows contribute no matches
    val a = dirty.select($"iid".as("aid"), $"lo".as("alo"), $"hi".as("ahi"))
    val b = intervals.select($"iid".as("bid"), $"lo".as("blo"), $"hi".as("bhi"))
    val overlaps = RangeJoin.intervalOverlap(a, $"alo", $"ahi", b, $"blo", $"bhi", 500L)
      .select($"aid").as[Long].collect()
    assert(!overlaps.contains(500L) && !overlaps.contains(501L))
  }

  test("no nested-loop join in the physical plan") {
    val plan = RangeJoin.pointInInterval(points, $"x", intervals, $"lo", $"hi", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }
}
