package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** TopK aggregator laws vs brute force: exact top-k per group under any
  * partitioning/merge order, deterministic tie-break.
  */
class TopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("perGroup equals brute-force top-k with (score desc, id asc) order") {
    val rnd = new scala.util.Random(31)
    val rows = (0 until 5000).map { i =>
      (rnd.nextInt(7).toString, TopK.Entry(rnd.nextInt(50).toDouble, i.toLong))
    }
    val got = TopK.perGroup(rows.toDS().repartition(8), 5)
      .collect().map { case (k, buf) => k -> buf.items }.toMap
    val expect = rows.groupBy(_._1).view.mapValues(
      _.map(_._2).sortBy(e => (-e.score, e.id)).take(5).toSeq).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (k, v) => assert(got(k) == v, s"group $k") }
  }

  test("merge is order-insensitive and respects k under duplicates") {
    val es = Seq(TopK.Entry(5.0, 1), TopK.Entry(5.0, 2), TopK.Entry(5.0, 1),
      TopK.Entry(3.0, 9), TopK.Entry(9.0, 4))
    val agg = new TopK.TopKAgg[String](3)
    val seqd = es.foldLeft(agg.zero)((b, e) => agg.reduce(b, ("g", e)))
    val (l, r) = es.splitAt(2)
    val merged = agg.merge(
      l.foldLeft(agg.zero)((b, e) => agg.reduce(b, ("g", e))),
      r.foldLeft(agg.zero)((b, e) => agg.reduce(b, ("g", e))))
    assert(seqd.items == merged.items)
    assert(seqd.items == Seq(TopK.Entry(9.0, 4), TopK.Entry(5.0, 1), TopK.Entry(5.0, 1)))
  }
}
