package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-Min + Misra-Gries frequency sketching: the CMS one-sided error
  * law, the MG candidate-superset guarantee that makes `heavyHitters`
  * exact, and partitioning-invariance (mergeability) of the composed
  * result on a skewed corpus.
  */
class FreqSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Zipf-ish skewed corpus: token i appears ~1000/i times. */
  private def skewed = (1 to 60).flatMap(i => Seq.fill(1000 / i)(s"tok$i"))

  test("CMS never undercounts, and matches exact counts when width avoids collisions") {
    val toks = skewed.toDF("tok")
    val exact = skewed.groupBy(identity).view.mapValues(_.size.toLong).toMap

    val narrow = FreqSketch.countMinTable(toks, "tok", depth = 4, width = 16)
    val probes = skewed.distinct.toDF("tok")
    val est = FreqSketch.cmsEstimate(narrow, probes, "tok", depth = 4, width = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (t, c) =>
      assert(est(t) >= c, s"CMS undercounted $t: ${est(t)} < $c")
    }

    // width ≫ vocabulary: every row has a collision-free bucket w.h.p.;
    // with 60 tokens and 4 independent rows of 4096 buckets the min is
    // exact for this fixed (deterministic) hash family — assert it
    val wide = FreqSketch.countMinTable(toks, "tok", depth = 4, width = 4096)
    val est2 = FreqSketch.cmsEstimate(wide, probes, "tok", depth = 4, width = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est2 == exact, "wide CMS should be collision-free on 60 tokens")
  }

  test("CMS table never exceeds depth*width rows (bounded shuffle key space)") {
    val toks = skewed.toDF("tok")
    assert(FreqSketch.countMinTable(toks, "tok", 4, 16).count() <= 4L * 16)
  }

  test("heavyHitters is EXACT on a skewed corpus and invariant to partitioning") {
    val minCount = 25L
    val exact = skewed.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= minCount).toMap
    for (parts <- Seq(1, 13)) {
      val toks = skewed.toDF("tok").repartition(parts)
      val got = FreqSketch.heavyHitters(toks, "tok", minCount)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == exact, s"parts=$parts: $got != $exact")
    }
  }

  test("MG candidate set contains every token above the error bound (adversarial tail)") {
    // 5 true heavy tokens drowned in a long tail of 4000 singletons — the
    // shape that breaks naive per-partition top-k candidate generation
    val heavy = (1 to 5).flatMap(i => Seq.fill(50)(s"hh$i"))
    val tail = (1 to 4000).map(i => s"tail$i")
    val corpus = scala.util.Random.shuffle(heavy ++ tail)
    val got = FreqSketch.heavyHitters(
        corpus.toDF("tok").repartition(7), "tok", minCount = 50L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == (1 to 5).map(i => s"hh$i" -> 50L).toMap)
  }

  test("heavyHitters drops null tokens instead of crashing the typed encoder") {
    val toks = (Seq.fill(40)(Some("a")) ++ Seq(None, None)).toDF("tok")
    val got = FreqSketch.heavyHitters(toks, "tok", minCount = 10L).collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 40L)))
  }

  test("empty input yields an empty result, not a failure") {
    val toks = Seq.empty[String].toDF("tok")
    assert(FreqSketch.heavyHitters(toks, "tok", 5L).count() == 0L)
  }
}
