package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join without the cross-product blow-up.
  *
  * A naive `p JOIN i ON p.x BETWEEN i.lo AND i.hi` has no equi-key, so Spark
  * plans BroadcastNestedLoopJoin (or a cartesian) — O(|P|·|I|) compares,
  * catastrophic at 100 TB. The scale-safe formulation buckets the domain:
  * each interval is exploded to every bucket of width `bucket` it overlaps
  * (`sequence(floor(lo/b), floor(hi/b))`), each point maps to exactly one
  * bucket, and the join becomes an equi-join on the bucket id followed by the
  * exact BETWEEN residual filter. Shuffle is hash-partitioned on bucket — a
  * plain SortMergeJoin/BHJ that AQE can also skew-split.
  *
  * Pick `bucket` ≈ the median interval width: explosion factor stays ~2 while
  * each bucket pairs only co-located points/intervals. Degenerate buckets
  * (one giant interval spanning the domain) cost |buckets-touched| rows on
  * the interval side only — still linear, never quadratic.
  */
object RangeJoin {

  /** Bucket ids covered by [lo, hi], as an exploded-safe array: a dirty
    * interval row (hi < lo, or a NULL bound) yields an empty array — Explode
    * then drops the row, matching the unbucketized join (which matches
    * nothing for it) instead of throwing "Illegal sequence boundaries".
    */
  private def bucketSeq(lo: Column, hi: Column, b: Column): Column = {
    val bLo = floor(lo / b).cast("long")
    val bHi = floor(hi / b).cast("long")
    when(bLo.isNotNull && bHi.isNotNull && bLo <= bHi, sequence(bLo, bHi))
      .otherwise(array().cast("array<long>"))
  }

  /** Inner-join `points` to `intervals` on containment:
    * `pointCol BETWEEN loCol AND hiCol` (inclusive both ends), all columns of
    * both inputs preserved. Column names must not collide (pre-alias).
    *
    * `broadcastIntervals` (default true) pins the join direction: intervals
    * are dimension-like (even exploded by buckets) while points are the
    * fact side — without the hint, local byte estimates can flip the build
    * side and broadcast the POINTS, which deadlocks memory the moment the
    * fact side is real (observed: a 100k-point scan chosen as build side).
    * Pass false only when the interval set itself is huge; the join then
    * shuffles both sides on the bucket key.
    */
  def pointInInterval(points: DataFrame, pointCol: Column,
                      intervals: DataFrame, loCol: Column, hiCol: Column,
                      bucket: Long, broadcastIntervals: Boolean = true): DataFrame = {
    require(bucket > 0, "bucket width must be positive")
    val b = lit(bucket)
    val ivals = intervals
      .withColumn("_rj_bucket", explode(bucketSeq(loCol, hiCol, b)))
      .withColumn("_rj_lo", loCol).withColumn("_rj_hi", hiCol)
    val pts = points
      .withColumn("_rj_bucket", floor(pointCol / b).cast("long"))
      .withColumn("_rj_p", pointCol)
    val rhs = if (broadcastIntervals) broadcast(ivals) else ivals
    pts.join(rhs, Seq("_rj_bucket"))
      .filter(col("_rj_p") >= col("_rj_lo") && col("_rj_p") <= col("_rj_hi"))
      .drop("_rj_bucket", "_rj_p", "_rj_lo", "_rj_hi")
  }

  /** Interval-overlap join: pairs where [alo,ahi] ∩ [blo,bhi] ≠ ∅. Same
    * bucket trick on both sides; the bucket-equality join emits each
    * overlapping pair once per shared bucket, so a post-join dedupe key is
    * required — instead we keep only the pair's FIRST shared bucket
    * (`greatest(floor(alo/b), floor(blo/b)) == bucket`), which emits exactly
    * once with no distinct shuffle.
    */
  def intervalOverlap(a: DataFrame, aLo: Column, aHi: Column,
                      b: DataFrame, bLo: Column, bHi: Column,
                      bucket: Long): DataFrame = {
    require(bucket > 0, "bucket width must be positive")
    val w = lit(bucket)
    val ea = a.withColumn("_rj_bucket", explode(bucketSeq(aLo, aHi, w)))
      .withColumn("_rj_alo", aLo).withColumn("_rj_ahi", aHi)
    val eb = b.withColumn("_rj_bucket", explode(bucketSeq(bLo, bHi, w)))
      .withColumn("_rj_blo", bLo).withColumn("_rj_bhi", bHi)
    ea.join(eb, Seq("_rj_bucket"))
      .filter(col("_rj_alo") <= col("_rj_bhi") && col("_rj_blo") <= col("_rj_ahi"))
      .filter(col("_rj_bucket") ===
        greatest(floor(col("_rj_alo") / w), floor(col("_rj_blo") / w)).cast("long"))
      .drop("_rj_bucket", "_rj_alo", "_rj_ahi", "_rj_blo", "_rj_bhi")
  }
}
