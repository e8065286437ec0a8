package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom-pruned semi join: identical result to the plain semi join (no false
  * negatives), with the probe side actually pruned map-side.
  */
class BloomJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val probe = (0L until 2000L).map(i => (i, s"p$i")).toDF("pk", "pv")
  private lazy val build = (0L until 2000L by 100).map(i => (i, s"b$i")).toDF("bk", "bv")

  test("semiJoin equals the plain left-semi join") {
    val expect = probe.join(build, col("pk") === col("bk"), "left_semi")
      .select("pk").as[Long].collect().toSet
    val got = BloomJoin.semiJoin(probe, col("pk"), build, col("bk"),
        expectedItems = 100L)
      .select("pk").as[Long].collect().toSet
    assert(got == expect)
    assert(got.size == 20)
  }

  test("bloom pre-filter prunes most non-matching probe rows") {
    val bloom = BloomJoin.buildBloom(build, col("bk"), expectedItems = 100L,
      fpp = 0.01)
    val pass = probe.filter(BloomJoin.mightContain(bloom, col("pk"))).count()
    // 20 true matches; false positives bounded well below the probe size
    assert(pass >= 20L && pass <= 20L + (2000 * 0.05).toLong,
      s"bloom passed $pass rows")
  }

  test("sizing past the session's runtime-filter caps still builds " +
    "(the 10^9-gram scale contract)") {
    // 8M items at 1% fpp exceeds BOTH analysis caps the session defaults
    // impose on BloomFilterAggregate: maxNumItems (4e6) and maxNumBits
    // (2^26 ≈ 67.1M bits; this sizing wants ~76.7M) — before buildBloom
    // raised them, this line threw AnalysisException and
    // decontaminateBloom's documented eval-set scale was unreachable
    val bloom = BloomJoin.buildBloom(build, col("bk"),
      expectedItems = 8000000L, fpp = 0.01)
    val trueKeys = build.select(col("bk")).as[Long].collect()
    val kept = probe.filter(BloomJoin.mightContain(bloom, col("pk")))
      .select("pk").as[Long].collect().toSet
    assert(trueKeys.forall(kept.contains))
  }

  test("a cap-exceeding buildBloom never touches the shared session's " +
    "runtime-filter caps (child-session isolation)") {
    // the caps also govern Spark's auto-injected runtime filters: a raise
    // visible on the shared session — even transiently — lets a concurrent
    // query plan a multi-GB optimizer bloom the default cap exists to
    // prevent (the round-13 raise-then-restore race)
    val keys = Seq("spark.sql.optimizer.runtime.bloomFilter.maxNumItems",
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits")
    val before = keys.map(k => spark.conf.getOption(k))
    BloomJoin.buildBloom(build, col("bk"), expectedItems = 8000000L, fpp = 0.01)
    assert(keys.map(k => spark.conf.getOption(k)) == before,
      "shared-session runtime-filter caps were modified by buildBloom")
  }

  test("bloom rejects never drop true matches across fpp settings") {
    for (fpp <- Seq(0.3, 0.01)) {
      val bloom = BloomJoin.buildBloom(build, col("bk"), 100L, fpp)
      val trueKeys = build.select(col("bk")).as[Long].collect()
      val kept = probe.filter(BloomJoin.mightContain(bloom, col("pk")))
        .select("pk").as[Long].collect().toSet
      assert(trueKeys.forall(kept.contains))
    }
  }
}
