package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** gapFill laws: dense per-key grid, LOCF values, zero-count gap rows, and
  * key independence.
  */
class TimeSeriesOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: (String, Long, Double)*) =
    TimeSeriesOps.gapFill(rows.toDF("k", "b", "v"), "k", "b", "v")
      .select("k", "b", "value_filled", "n_events")
      .as[(String, Long, Double, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2))

  test("grid is dense from first to last bucket; gaps carry the prior value with 0 events") {
    val got = run(("a", 10L, 1.5), ("a", 13L, 9.0), ("a", 13L, 2.0))
    assert(got == Seq(
      ("a", 10L, 1.5, 1L),
      ("a", 11L, 1.5, 0L),   // gap → LOCF of bucket 10
      ("a", 12L, 1.5, 0L),
      ("a", 13L, 9.0, 2L))) // bucket max of {9.0, 2.0}, both events counted
  }

  test("keys fill independently and spans don't bleed") {
    val got = run(("a", 1L, 1.0), ("a", 3L, 2.0), ("b", 7L, 5.0))
    assert(got == Seq(
      ("a", 1L, 1.0, 1L), ("a", 2L, 1.0, 0L), ("a", 3L, 2.0, 1L),
      ("b", 7L, 5.0, 1L)))
  }

  test("single-bucket key yields exactly one row, no grid explosion") {
    val got = run(("x", 42L, 3.25), ("x", 42L, 1.0))
    assert(got == Seq(("x", 42L, 3.25, 2L)))
  }

  test("total grid size is sum of per-key spans (never a cross of keys)") {
    val rows = (1 to 20).map(i => (s"k$i", i * 100L, 1.0)) ++
      (1 to 20).map(i => (s"k$i", i * 100L + 9L, 2.0))
    val got = run(rows: _*)
    assert(got.size == 20 * 10) // each key spans exactly 10 buckets
    assert(got.count(_._4 == 0L) == 20 * 8)
  }
}
