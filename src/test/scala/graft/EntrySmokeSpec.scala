package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must at least execute and return rows at sf0.001
  * (the driver smoke-checks `entry` the same way).
  */
class EntrySmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name executes with rows at sf0.001") {
      assert(fn(spark, TestSpark.sf0001).count() > 0, s"$name returned 0 rows")
    }
  }
}
