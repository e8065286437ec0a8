package graft

import org.scalatest.funsuite.AnyFunSuite

/** The stale-fixture sweep must be DATASET-scoped: a session alternating
  * between two sf dirs (exactly what mixed test/bench sessions do) must
  * keep both dirs' fixture tables live instead of dropping and rebuilding
  * each other's on every switch (the pre-round-11 behavior — the sweep
  * matched on prefix + fingerprint only, and every other dataset's
  * fingerprint looked stale).
  */
class FixtureSweepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dirA = "/root/testdata/sf0.001"
  private val dirB = "/root/testdata/sf0.01"

  private def liveFixtures(): Set[String] =
    spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith("ann_lsh_index_src")).toSet

  test("alternating sf dirs keeps both datasets' fixtures live " +
    "(sweep scoped by dir hash)") {
    SparkEntry.queries("ann_lsh_indexed")(spark, dirA).count()
    val afterA = liveFixtures()
    assert(afterA.nonEmpty, "dir A built no fixture table")
    SparkEntry.queries("ann_lsh_indexed")(spark, dirB).count()
    val afterB = liveFixtures()
    assert(afterA.subsetOf(afterB),
      s"building dir B's fixture swept dir A's live fixture: " +
        s"had ${afterA.mkString(",")}, now ${afterB.mkString(",")}")
    assert(afterB.size > afterA.size, "dir B built no fixture table")
    // switching back must be a pure metadata hit — no sweep, no rebuild
    SparkEntry.queries("ann_lsh_indexed")(spark, dirA).count()
    assert(liveFixtures() === afterB,
      "re-touching dir A changed the fixture set (rebuild churn)")
  }
}
