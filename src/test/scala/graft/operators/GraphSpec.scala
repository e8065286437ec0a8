package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions.{col, sum}
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

  test("cooccurrenceEdges: distinct a<b pairs per group, capped groups dropped whole") {
    val rows = Seq(
      ("g1", "1"), ("g1", "2"), ("g1", "3"),
      ("g2", "2"), ("g2", "3"), ("g2", "3"), // dup item collapses
      ("big", "1"), ("big", "2"), ("big", "3"), ("big", "4"), ("big", "5"))
      .toDF("grp", "item")
    val edges = Graph.cooccurrenceEdges(rows, "grp", "item", maxGroupSize = 4)
      .as[(String, String)].collect().toSet
    // "big" (5 distinct items > cap) contributes nothing; g1 the triangle,
    // g2 re-derives (2,3) which the distinct collapses
    assert(edges === Set(("1", "2"), ("1", "3"), ("2", "3")))
  }

  test("triangleStats: hand-computed censuses") {
    // triangle + pendant: deg a=2 b=2 c=3 d=1 -> wedges 1+1+3+0 = 5, 1 tri
    val tp = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"))
      .toDF("a", "b")
    val r1 = Graph.triangleStats(tp, "a", "b")
      .as[(Long, Long, Long, Long, Double)].head()
    assert(r1 === ((4L, 4L, 5L, 1L, 3.0 * 1 / 5)))

    // K4: 4 nodes, 6 edges, wedges 4*3 = 12, 4 triangles, clustering 1.0
    val k4 = (for {
      x <- Seq("a", "b", "c", "d"); y <- Seq("a", "b", "c", "d")
      if x < y
    } yield (x, y)).toDF("a", "b")
    val r2 = Graph.triangleStats(k4, "a", "b")
      .as[(Long, Long, Long, Long, Double)].head()
    assert(r2 === ((4L, 6L, 12L, 4L, 1.0)))

    // star (no triangles, all wedges at the hub)
    val star = Seq(("a", "h"), ("b", "h"), ("c", "h")).toDF("a", "b")
    val r3 = Graph.triangleStats(star, "a", "b")
      .as[(Long, Long, Long, Long, Double)].head()
    assert(r3 === ((4L, 3L, 3L, 0L, 0.0)))

    // empty graph: all zeros, clustering 0.0 (no NaN, no NPE)
    val empty = Seq.empty[(String, String)].toDF("a", "b")
    val r4 = Graph.triangleStats(empty, "a", "b")
      .as[(Long, Long, Long, Long, Double)].head()
    assert(r4 === ((0L, 0L, 0L, 0L, 0.0)))
  }

  test("localClustering: hand-computed coefficients; corner-credit conservation") {
    // triangle + pendant: a,b (deg 2, 1 tri, lcc 1.0); c (deg 3, 1 tri,
    // lcc 1/3); d (deg 1, lcc 0)
    val tp = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")).toDF("a", "b")
    val got = Graph.localClustering(tp, "a", "b")
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got === Set(("a", 2L, 1L, 1.0), ("b", 2L, 1L, 1.0),
      ("c", 3L, 1L, 2.0 / 6), ("d", 1L, 0L, 0.0)))

    // K4: every node deg 3, 3 triangles, lcc 1.0
    val k4 = (for {
      x <- Seq("a", "b", "c", "d"); y <- Seq("a", "b", "c", "d")
      if x < y
    } yield (x, y)).toDF("a", "b")
    val k4got = Graph.localClustering(k4, "a", "b")
      .as[(String, Long, Long, Double)].collect().toSet
    assert(k4got === Set("a", "b", "c", "d").map(n => (n, 3L, 3L, 1.0)))
  }

  test("localClustering per-node credits sum to 3x the global census on a random graph") {
    val rnd = new scala.util.Random(37)
    val nodes = (0 until 25).map(i => f"n$i%02d")
    val edges = (for {
      i <- nodes.indices; j <- nodes.indices
      if i < j && rnd.nextDouble() < 0.3
    } yield (nodes(i), nodes(j))).distinct.toDF("a", "b")
    val total = Graph.triangleStats(edges, "a", "b")
      .select("n_triangles").as[Long].head()
    val credits = Graph.localClustering(edges, "a", "b")
      .agg(sum(col("triangles"))).as[Long].head()
    assert(credits === 3 * total, "every triangle credits exactly 3 corners")
  }

  test("triangleStats: orientation result matches a brute-force census") {
    // deterministic random graph; brute force = all node triples with all
    // three edges present
    val rnd = new scala.util.Random(23)
    val nodes = (0 until 20).map(i => f"n$i%02d")
    val edges = (for {
      i <- nodes.indices; j <- nodes.indices
      if i < j && rnd.nextDouble() < 0.25
    } yield (nodes(i), nodes(j))).distinct
    val eSet = edges.toSet
    val brute = (for {
      i <- nodes.indices; j <- nodes.indices; k <- nodes.indices
      if i < j && j < k &&
        eSet((nodes(i), nodes(j))) && eSet((nodes(j), nodes(k))) &&
        eSet((nodes(i), nodes(k)))
    } yield 1).size.toLong
    val got = Graph.triangleStats(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Long, Double)].head()
    assert(got._4 === brute, s"orientation census vs brute force")
    assert(got._2 === edges.size.toLong)
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
