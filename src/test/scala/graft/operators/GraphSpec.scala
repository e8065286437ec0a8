package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Sequential reference of the exact integer recurrence. */
  private def reference(edges: Seq[(String, String)], iters: Int,
                        damp: Int, scale: Long): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = scale * (100L - damp) / 100L
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view.mapValues(_.map { case (s, _) =>
        r(s) * damp / (100L * outdeg(s))
      }.sum).toMap
      r = nodes.map(n => n -> (base + in.getOrElse(n, 0L))).toMap
    }
    r
  }

  private val diamond = Seq(
    ("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "a"))

  test("integerPageRank equals the sequential recurrence, any iteration count") {
    for (iters <- Seq(0, 1, 4, 7)) {
      val got = Graph.integerPageRank(diamond.toDF("s", "t"), "s", "t",
          iters, 85, 1000000L)
        .as[(String, Long)].collect().toMap
      assert(got == reference(diamond, iters, 85, 1000000L), s"iters=$iters")
    }
  }

  test("hub structure ranks the sink above the spokes") {
    // star: spokes all point at hub; hub points at one spoke
    val star = (1 to 9).map(i => (s"n$i", "hub")) :+ (("hub", "n1"))
    val r = Graph.integerPageRank(star.toDF("s", "t"), "s", "t", 5)
      .as[(String, Long)].collect().toMap
    assert(r("hub") > r("n1") && r("n1") > r("n2"), r.toString)
    // n2..n9 are structurally identical ⇒ identical integer mass
    assert((2 to 9).map(i => r(s"n$i")).toSet.size == 1)
  }

  test("dangling nodes absorb mass; null/absent edges are dropped") {
    val edges = Seq(("a", "b"), (null, "c"), ("c", null)).asInstanceOf[Seq[(String, String)]]
    val r = Graph.integerPageRank(edges.toDF("s", "t"), "s", "t", 2)
      .as[(String, Long)].collect().toMap
    // only the (a, b) edge survives; b is dangling and keeps receiving
    assert(r.keySet == Set("a", "b"))
    assert(r("b") > r("a"))
  }
}
