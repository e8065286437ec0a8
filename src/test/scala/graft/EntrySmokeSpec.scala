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

  test("every query has an oracle, or is on the documented rows-only list") {
    // the round-4 failure mode: a query shipped without an oracle entry and
    // the driver silently downgraded it to a rows-only check. Any rows-only
    // query must be DECLARED here with its reason.
    // empty since round 10: q_approx_distinct_sketch (HLL registers,
    // engine-private → rows-only for nine rounds) was retired into the
    // oracle-verified KMV family; its plan/error properties moved to
    // ApproxAggSpec. Every shipped query is now oracle-checked.
    val rowsOnlyByDesign = Set.empty[String]
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled == rowsOnlyByDesign,
      s"queries without oracle SQL (add an oracle or declare rows-only): " +
        s"${unoracled -- rowsOnlyByDesign}; " +
        s"stale rows-only declarations: ${rowsOnlyByDesign -- unoracled}")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name executes with rows at sf0.001") {
      assert(fn(spark, TestSpark.sf0001).count() > 0, s"$name returned 0 rows")
    }
  }
}
