package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Declarative data-quality auditing (the Deequ/great-expectations shape,
  * re-expressed Spark-first): a suite of checks over one table compiles into
  * ONE aggregation pass — however many checks, the table is scanned once and
  * the shuffle carries a single partial-aggregate row per partition. The
  * result is a tiny (check, column, observed, lo, hi, pass) table suitable
  * for gating a pipeline stage ("fail the ingest if any `pass` is false").
  *
  * Every metric is an exact INTEGER count and every verdict an inclusive
  * integer-bounds comparison, so a SQL oracle replays the audit bit-for-bit
  * (no float fractions to drift; callers wanting rates divide downstream).
  *
  * At 100 TB: checks are conditional counts fused into the scan's
  * whole-stage codegen; `distinctCount`/`duplicateCount` add the usual
  * two-phase distinct aggregation (partial distinct per partition). The one
  * check that inherently needs a second input — referential integrity — is
  * a separate broadcast/shuffled anti-join pass ([[referentialViolations]])
  * that unions onto the same report schema.
  */
object QualityAudit {

  /** One check: `agg` must be an aggregate expression yielding a LONG;
    * verdict is `lo <= observed <= hi` (inclusive).
    */
  final case class Check(check: String, column: String, agg: Column,
                         lo: Long, hi: Long)

  /** Total rows in [lo, hi]. */
  def rowCount(lo: Long, hi: Long = Long.MaxValue): Check =
    Check("row_count", "*", count(lit(1)), lo, hi)

  /** At most `maxNulls` nulls in `c`. */
  def nullCount(c: String, maxNulls: Long = 0L): Check =
    Check("null_count", c, count(when(col(c).isNull, 1)), 0L, maxNulls)

  /** Distinct non-null values of `c` in [lo, hi]. */
  def distinctCount(c: String, lo: Long, hi: Long = Long.MaxValue): Check =
    Check("distinct_count", c, count_distinct(col(c)), lo, hi)

  /** At most `maxDup` surplus rows beyond one per distinct non-null value —
    * 0 asserts `c` unique among non-null rows (pair with [[nullCount]] for
    * full key integrity).
    */
  def duplicateCount(c: String, maxDup: Long = 0L): Check =
    Check("duplicate_count", c,
      count(col(c)) - count_distinct(col(c)), 0L, maxDup)

  /** At most `max` non-null values of `c` outside the inclusive numeric
    * range [lo, hi].
    */
  def boundViolations(c: String, lo: Long, hi: Long, max: Long = 0L): Check =
    Check("bound_violations", c,
      count(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1)),
      0L, max)

  /** At most `max` non-null values of `c` outside `allowed`. */
  def setViolations(c: String, allowed: Seq[String], max: Long = 0L): Check =
    Check("set_violations", c,
      count(when(col(c).isNotNull && !col(c).isin(allowed: _*), 1)), 0L, max)

  /** Rows whose `c` rlike-matches `pattern` (portable regex subset — keep to
    * character classes/anchors/quantifiers so SQL oracles agree) in
    * [lo, hi]. Null never matches.
    */
  def matchingCount(c: String, pattern: String, lo: Long,
                    hi: Long = Long.MaxValue): Check =
    Check("matching_count", c, count(when(col(c).rlike(pattern), 1)), lo, hi)

  /** Run the suite in one pass. Output: (check, column, observed, lo, hi,
    * pass), one row per check, in suite order.
    */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit: empty check suite")
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      c.agg.cast("long").as(s"_m$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      val m = coalesce(col(s"_m$i"), lit(0L)) // count_distinct of all-null
      struct(lit(c.check).as("check"), lit(c.column).as("column"),
        m.as("observed"), lit(c.lo).as("lo"), lit(c.hi).as("hi"),
        (m >= c.lo && m <= c.hi).as("pass"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Referential integrity as a report row: count of `fact` rows whose
    * `fkCol` has no match in `dim.pkCol` (nulls count as violations — a
    * null FK can't join), bounded by `max`. A LEFT ANTI join — broadcast
    * when the dim is small, shuffled equi-join otherwise; either way no
    * fact-side data beyond the FK column moves.
    */
  def referentialViolations(fact: DataFrame, fkCol: String, dim: DataFrame,
                            pkCol: String, max: Long = 0L): DataFrame = {
    val viol = fact.select(col(fkCol))
      .join(dim.select(col(pkCol)).distinct(),
        col(fkCol) === col(pkCol), "left_anti")
      .agg(count(lit(1)).cast("long").as("observed"))
    viol.select(lit("referential_violations").as("check"),
      lit(fkCol).as("column"), col("observed"),
      lit(0L).as("lo"), lit(max).as("hi"),
      (col("observed") <= max).as("pass"))
  }
}
