package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Runtime bloom-filter join pruning — the pattern Spark's own
  * InjectRuntimeFilter applies to shuffle joins, exposed as an operator so a
  * pipeline can pre-filter a huge probe side BEFORE the exchange:
  *
  *   1. aggregate the (small) build side's join keys into a bloom filter —
  *      one binary scalar, collected to the driver (the same footprint as a
  *      broadcast variable; ~1.2 MB at 1M keys / 1% fpp);
  *   2. probe-side rows failing `might_contain` are dropped map-side, inside
  *      the scan's codegen stage — they never reach the shuffle;
  *   3. the exact join runs on the survivors. Blooms have no false negatives,
  *      so the result is exactly the unfiltered join's result.
  *
  * At 100 TB the win is the shuffle bytes: a 1% selective build side turns a
  * full-probe exchange into ~1% + fpp of it for the cost of one map-side
  * hash per row.
  */
object BloomJoin {

  /** Bloom filter over `key` of `build` as one binary value (driver-side),
    * sized for `expectedItems` at false-positive rate `fpp`.
    */
  def buildBloom(build: DataFrame, key: Column, expectedItems: Long,
                 fpp: Double = 0.01): Array[Byte] = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    // optimal bits m = -n ln(p) / (ln 2)^2
    val numBits = math.max(64L,
      math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    // BloomFilterAggregate analysis-checks its sizing against the session's
    // runtime-filter caps (maxNumItems default 4e6; maxNumBits default 2^26,
    // hit near 7e6 items at 1% fpp) — caps meant for the OPTIMIZER's
    // auto-injected filters, where oversizing is a planner bug. Here the
    // caller states the sizing explicitly (a 10^9-gram decontamination set
    // is the designed load), so run the aggregation on a CHILD session with
    // the caps raised there: the shared session's conf — which also governs
    // Spark's InjectRuntimeFilter auto-injected blooms — is never touched,
    // so there is no raise/restore window for a concurrent query to plan an
    // oversized optimizer filter under, and no way for a concurrent
    // buildBloom to lose its caps mid-aggregation (the round-13 raise-then-
    // restore had both races). newSession() shares the SparkContext and
    // shared-state cache manager (cached build frames stay cache-fed) but
    // owns its conf; the already-analyzed plan rebinds without
    // re-resolution.
    val session = build.sparkSession.newSession()
    session.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", expectedItems.toString)
    session.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", numBits.toString)
    val agg = new BloomFilterAggregate(
      XxHash64(Seq(expression(key)), 42L),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    org.apache.spark.sql.GraftBridge.withSession(build, session)
      .select(column(agg).as("bloom")).head().getAs[Array[Byte]](0)
  }

  /** `might_contain(bloom, xxhash64(key))` as a Column predicate. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    column(BloomFilterMightContain(
      Literal(bloom, BinaryType), XxHash64(Seq(expression(key)), 42L)))

  /** Left-semi join with a bloom pre-filter on the probe side: exactly the
    * rows of `probe JOIN build ON probeKey = buildKey` (semi), with the
    * probe side pruned map-side first.
    */
  def semiJoin(probe: DataFrame, probeKey: Column,
               build: DataFrame, buildKey: Column,
               expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bloom = buildBloom(build, buildKey, expectedItems, fpp)
    probe.filter(mightContain(bloom, probeKey))
      .join(build, probeKey === buildKey, "left_semi")
  }
}
