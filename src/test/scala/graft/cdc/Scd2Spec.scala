package graft.cdc

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CDC state-materialization laws: compaction keeps exactly the newest
  * version; SCD2 intervals chain without gaps/overlaps and flag one current
  * row per key.
  */
class Scd2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // key -> versions at offsets; payload tracks which version we see
  private lazy val versions = Seq(
    (1L, 10L, "a1"), (1L, 20L, "a2"), (1L, 30L, "a3"),
    (2L, 15L, "b1"),
    (3L, 5L, "c1"), (3L, 50L, "c2"))
    .toDF("key", "off", "payload")

  test("compact keeps the newest version per key with its payload") {
    val got = Scd2.compact(versions, Seq("key"), col("off"), Seq("off", "payload"))
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 30L, "a3"), (2L, 15L, "b1"), (3L, 50L, "c2")))
  }

  test("historize: half-open intervals chain, exactly one current per key") {
    val h = Scd2.historize(versions, Seq("key"), col("off"))
    val rows = h.select("key", "off", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
    // one current row per key, and it is the max-offset version
    val current = rows.filter(_._5)
    assert(current.map(_._1).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(current.map(r => (r._1, r._2)).toSet == Set((1L, 30L), (2L, 15L), (3L, 50L)))
    // each non-current row's valid_to equals the next version's valid_from
    val byKey = rows.groupBy(_._1)
    byKey.values.foreach { vs =>
      val sorted = vs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(prev, next) =>
          assert(prev._4.contains(next._3), s"gap: $prev -> $next")
        case _ => ()
      }
      assert(sorted.last._4.isEmpty)
    }
  }

  test("applyChanges: upsert overrides, delete drops, insert adds, stale change loses") {
    val base = Seq(
      ("k1", 10L), ("k2", 10L), ("k3", 10L) // snapshot at version 10
    ).toDF("k", "v")
    val changes = Seq(
      ("k1", 20L, "U"),  // update k1
      ("k2", 20L, "D"),  // delete k2
      ("k4", 20L, "U"),  // insert new key
      ("k4", 30L, "D"),  // ...then delete it again (newest wins)
      ("k5", 5L, "U"), ("k5", 6L, "D"), ("k5", 7L, "U") // churn: final U
    ).toDF("k", "v", "op")
    val got = graft.cdc.Scd2.applyChanges(base, changes, Seq("k"),
        col("v"), col("op"), Seq("v"))
      .as[(String, Long)].collect().toMap
    // k1 updated to 20, k2 deleted, k3 untouched, k4 net-deleted, k5 at 7
    assert(got == Map("k1" -> 20L, "k3" -> 10L, "k5" -> 7L))
  }
}
