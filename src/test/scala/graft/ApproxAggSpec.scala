package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HLL++ approx distinct (no SQL oracle possible) must stay within its
  * configured relative-error envelope vs the exact count on real test data.
  */
class ApproxAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("approx_count_distinct within 5% of exact at rsd=0.02") {
    val ev = Tables(spark, TestSpark.sf0001, "events")
    val rows = ev.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("a"),
        countDistinct(col("user_id")).as("e"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, e) = (r.getAs[Long]("a").toDouble, r.getAs[Long]("e").toDouble)
      assert(math.abs(a - e) / e <= 0.05, s"${r.getString(0)}: approx=$a exact=$e")
    }
  }
}
