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

  test("HLL-only distinct plan is sketch-shaped: one pass, no Expand, no exact-distinct shuffle") {
    // the property the retired q_approx_distinct_sketch query existed to
    // demonstrate: the production HLL path is a single mergeable partial
    // aggregate — only fixed-size sketches cross the wire. countDistinct
    // by contrast plans an Expand + a second shuffle keyed on the values.
    val ev = Tables(spark, TestSpark.sf0001, "events")
    val hllOnly = ev.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("n_users_approx"),
        approx_count_distinct(col("event_id"), 0.02).as("n_events_approx"),
        count(lit(1)).as("n_rows"))
    val plan = hllOnly.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"HLL-only plan must not Expand:\n$plan")
    // count only aggregation shuffles: the Tables loader's round-robin
    // repartition is input normalization, not part of the agg plan shape
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 1, s"HLL-only plan must shuffle sketches once, got $exchanges:\n$plan")
    // sanity contrast: the exact multi-distinct DOES pay the Expand
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")), countDistinct(col("event_id")))
    assert(exact.queryExecution.executedPlan.toString.contains("Expand"),
      "contrast broken: exact multi-distinct no longer plans an Expand")
  }
}
