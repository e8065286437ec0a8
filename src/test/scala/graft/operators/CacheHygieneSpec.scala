package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Session-level cache hygiene: operators that materialize intermediate
  * frames must not leave `InMemoryRelation`s behind in the shared
  * CacheManager — in a long-lived session running many operators those
  * entries accumulate storage memory until eviction thrash. The repo
  * discipline is Lineage.cut (ContextCleaner-owned blocks) for
  * loop-invariant sides and explicit unpersist-on-exit where a `.cache()`
  * is load-bearing.
  */
class CacheHygieneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("funnel + integerPageRank back-to-back leave the CacheManager empty") {
    spark.sharedState.cacheManager.clearCache()

    val events = Seq(
      (1L, 10L, "signup"), (1L, 20L, "view"), (1L, 30L, "purchase"),
      (2L, 10L, "signup"), (2L, 15L, "view"),
      (3L, 5L, "view"), (3L, 9L, "purchase")
    ).toDF("user_id", "ord", "event_type")
    val steps = Seq(
      "signup" -> (col("event_type") === "signup"),
      "view" -> (col("event_type") === "view"),
      "purchase" -> (col("event_type") === "purchase"))
    val funnel =
      EventAnalytics.funnel(events, "user_id", "ord", steps).collect()
    assert(funnel.length == 3)

    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"))
      .toDF("src", "dst")
    val ranks = Graph.integerPageRank(edges, "src", "dst", iters = 5)
    assert(ranks.count() == 3)

    assert(spark.sharedState.cacheManager.isEmpty,
      "a graft operator left an InMemoryRelation cached after returning")
  }

  test("events_funnel_latency query releases its latency cache") {
    spark.sharedState.cacheManager.clearCache()
    val r = graft.SparkEntry.queries("events_funnel_latency")(
      spark, TestSpark.sf0001)
    assert(r.collect().nonEmpty)
    assert(spark.sharedState.cacheManager.isEmpty,
      "events_funnel_latency left its latency frame cached")
  }
}
