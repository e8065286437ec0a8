package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import scala.util.chaining._

/** Distributed graph centrality over an edge list — the ranking pass a
  * crawl-scale pipeline runs to prioritize domains/documents (the
  * Common-Crawl-style "which sources matter" signal that feeds corpus
  * selection, re-expressed as bounded iterative equi-joins like
  * [[Dedup.duplicateGroups]]' pointer jumping).
  *
  * PageRank here is INTEGER-EXACT: ranks are integer mass (scaled by
  * `scale`), each contribution is `floor(m·damp / (100·outdeg))` in 64-bit
  * integer division, and the per-iteration update is
  * `mass' = floor(scale·(100-damp)/100) + Σ contributions`. No floating
  * point anywhere ⇒ the fixed-iteration result is order-independent and a
  * SQL oracle replays it bit-for-bit (the same quantization trick as
  * `corpus_importance`'s LLR and `corpus_perplexity`'s LM bits). Dangling
  * nodes (outdeg 0) absorb mass without redistributing it — the standard
  * simplification; rankings, not probabilities, are the product.
  *
  * Scale shape per iteration: ranks ⋈ edges on src (equi-join; ranks carry
  * 16 bytes/node), one hash aggregate on dst, one left join back to the
  * node set — three bounded shuffles, no driver materialization, lineage
  * truncated every few rounds exactly like connected components. K is fixed
  * and small (centrality stabilizes in a handful of damped rounds), so the
  * whole computation is O(K) shuffles of |edges| rows.
  */
object Graph {

  /** Fixed-iteration integer PageRank. `edges` rows are directed
    * (srcCol → dstCol) pairs (dedupe upstream if multiplicity should not
    * weight the walk). Returns (node, mass) for every node appearing as a
    * source or destination.
    *
    * `releaseCaches` (default true) materializes the result via an eager
    * [[Lineage.cut]] and unpersists the two loop-invariant cached sides on
    * exit, so nothing graft-created outlives the call in the session's
    * CacheManager. Pass false for an interactive session that re-runs the
    * same ranking repeatedly: the caches stay warm (slim frames — 16
    * bytes/node + one edge list — LRU-evictable, and CacheManager dedups
    * them by plan, so re-invocations skip the node/degree build entirely);
    * that caller owns the cache lifetime.
    */
  def integerPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                      iters: Int, dampPct: Int = 85,
                      scale: Long = 1000000L,
                      releaseCaches: Boolean = true): DataFrame = {
    require(iters >= 0 && iters <= 50, s"integerPageRank: iters=$iters")
    require(dampPct >= 0 && dampPct <= 100, s"integerPageRank: damp=$dampPct")
    require(scale > 0 && scale <= 1000000000L, s"integerPageRank: scale=$scale")
    // node ids keep their NATIVE orderable type (r17): the per-iteration
    // ranks⋈edges sort-merge joins and dst hash-aggs run 3×K times over the
    // edge list, and a numeric key sorts/hashes materially cheaper than its
    // string rendering (the triangleStats native-type argument applied
    // here). Callers with mixed-type sides cast before calling; src/dst
    // must share one type for the node union below.
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .na.drop()
    // the two loop-invariant sides are CACHED with pinned hash partitioning,
    // not checkpointed: InMemoryRelation preserves outputPartitioning, so
    // the per-iteration join/agg reuse it shuffle-free (a checkpoint's
    // LogicalRDD under AQE forgets it — measured 3 exchanges/iter, now 1);
    // their lineage is one step from the scan, so executor loss just
    // recomputes, and CacheManager dedups by plan across repeated runs
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .cache()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val withDeg = e.join(outdeg, "src") // every src has deg ≥ 1 by construction
      .repartition(col("src")) // pin hash(src) whatever join AQE picked
      .cache()
    val base = scale * (100L - dampPct) / 100L
    // every node contributes a zero row per iteration, folding the
    // dangling-node base term into the SAME aggregate that sums real
    // contributions — replaces the old per-iteration (nodes LEFT JOIN
    // contrib) with rows that ride the aggregate's existing shuffle
    val zeros = nodes.select(col("node"), lit(0L).as("c"))
    var ranks = nodes.withColumn("mass", lit(scale))
    for (i <- 1 to iters) {
      // merge hint: ranks is NODE-cardinality — the Dedup join-strategy
      // contract (AQE broadcast-promotes two-long tables at mid scales and
      // the driver build OOMs; measured in the r15 100x rehearsal's CC
      // loop). SMJ reuses withDeg's pinned hash(src) partitioning.
      val contrib = withDeg
        .join(ranks.withColumnRenamed("node", "src").hint("merge"), "src")
        .select(col("dst").as("node"),
          expr(s"(mass * $dampPct) div (100 * deg)").as("c"))
      ranks = contrib.union(zeros)
        .groupBy(col("node"))
        .agg((lit(base) + sum(col("c"))).as("mass"))
      // same pattern as Dedup.duplicateGroups: truncate the growing plan
      // every few rounds so round k doesn't recompute rounds 1..k-1
      if (i % 3 == 0 && i < iters) ranks = ranks.pipe(Lineage.cut)
    }
    // exit path: materialize the result (an EAGER cut — one job the caller
    // would have run anyway; output is one 16-byte row per node) and release
    // the loop-invariant caches, so no graft-created InMemoryRelation
    // outlives the operator in a long-lived session running many operators
    if (releaseCaches) {
      val out = Lineage.cut(ranks, eager = true)
      nodes.unpersist(blocking = false)
      withDeg.unpersist(blocking = false)
      out
    } else ranks
  }

  /** Undirected co-occurrence edges: one (a, b) row (a < b, distinct) per
    * pair of distinct `itemCol` values sharing a `groupCol` value — the
    * items-bought-together / terms-in-same-doc graph builder.
    *
    * `maxGroupSize` is the df-cap discipline applied to groups: a group of
    * size g emits g·(g-1)/2 pairs, so one boilerplate mega-group (a crawl's
    * navigation footer, a wholesale order) would dominate the edge list
    * quadratically; groups above the cap are dropped whole (the
    * [[Dedup]] winnowing argument — at 100 TB the cap is what bounds the
    * explode). Plan: group-size agg, join filter, one self-equi-join
    * on the group key with `a < b` as residual, distinct.
    */
  def cooccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String,
                        maxGroupSize: Int = 64): DataFrame = {
    require(maxGroupSize >= 2, s"cooccurrenceEdges: maxGroupSize=$maxGroupSize")
    val g = df.select(col(groupCol).as("g"), col(itemCol).as("i")).distinct()
    val small = g.groupBy(col("g")).agg(count(lit(1)).as("_n"))
      .filter(col("_n") <= maxGroupSize)
      .select(col("g"))
    val kept = g.join(small.hint("merge"), "g")
    // merge hints: small/kept are group-cardinality (join-strategy contract)
    kept.select(col("g"), col("i").as("a"))
      .join(kept.select(col("g"), col("i").as("b")).hint("merge"), "g")
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
      .distinct()
  }

  /** Per-node triangle participation and LOCAL clustering coefficient —
    * the node-granular companion of [[triangleStats]] (same degree-ordered
    * orientation, same once-per-triangle enumeration), and the signal a
    * curation pipeline ranks on: lcc ≈ 1 with high degree marks a dense
    * clique (link farms, boilerplate rings), lcc ≈ 0 a hub bridging
    * unrelated neighborhoods.
    *
    * Each closed triangle credits all THREE of its corners: the enumeration
    * emits one (x, y, pivot) row per triangle, a 3-way explode unpivots the
    * corners, and a count agg lands on the node key. lcc = 2·T_v / (d·(d−1))
    * as one exact-integer IEEE division (1.0 convention cap not needed —
    * T_v ≤ C(d,2) structurally). Fully lazy single plan: no driver
    * collects, output one row per node.
    *
    * @return (node, degree BIGINT, triangles BIGINT, lcc DOUBLE; lcc = 0.0
    *         for degree-1 nodes)
    */
  def localClustering(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = Lineage.cut(edges.select(col(aCol).as("a"), col(bCol).as("b")))
    val deg = e.select(col("a").as("n")).union(e.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val da = deg.select(col("n").as("a"), col("d").as("da"))
    val db = deg.select(col("n").as("b"), col("d").as("db"))
    // merge hints: deg/oriented/outNbr are node/edge-cardinality — the
    // Dedup join-strategy contract (no corpus-sized side may broadcast)
    val oriented = e.join(da.hint("merge"), "a").join(db.hint("merge"), "b")
      .select(
        when(col("da") < col("db") ||
             (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .pipe(Lineage.cut)
    val outNbr = oriented.join(db.withColumnRenamed("b", "v")
      .withColumnRenamed("db", "dv").hint("merge"), "v")
    val triangles = outNbr.select(col("u"), col("v").as("x"), col("dv").as("dx"))
      .join(outNbr.select(col("u"), col("v").as("y"), col("dv").as("dy"))
        .hint("merge"), "u")
      .filter(struct(col("dx"), col("x")) < struct(col("dy"), col("y")))
      .join(oriented.select(col("u").as("x"), col("v").as("y")).hint("merge"),
        Seq("x", "y"), "left_semi")
      .select(col("u"), col("x"), col("y"))
    val perNode = triangles
      .select(explode(array(col("u"), col("x"), col("y"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("triangles"))
    deg.join(perNode, Seq("n"), "left")
      .select(col("n").as("node"), col("d").as("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("lcc",
        when(col("degree") < 2, lit(0.0))
          .otherwise(lit(2.0) * col("triangles").cast("double") /
            (col("degree") * (col("degree") - 1)).cast("double")))
  }

  /** Exact triangle and wedge counts with the global clustering
    * coefficient, via DEGREE-ORDERED ORIENTATION — the classic bound that
    * makes triangle enumeration O(m^1.5) instead of Σ deg² on skewed
    * graphs: orient every undirected edge from its lower-(degree, id)
    * endpoint to the higher, so each node's OUT-degree is ≤ O(√m)
    * regardless of its raw degree, and the wedge self-join on the oriented
    * source enumerates each triangle exactly once (its minimum-order
    * vertex is the pivot).
    *
    * `edges`: undirected edge list, one row per edge with aCol < bCol
    * (what [[cooccurrenceEdges]] emits); self-loops and duplicates are the
    * caller's to pre-drop. Node ids keep their NATIVE orderable type — the
    * wedge stream is the operator's volume, so an int key must not widen
    * to a string on the way through it. All stages are equi-joins and hash
    * aggregates — wedge enumeration shuffles (pivot-keyed) pairs, the
    * closing check is one more equi-join against the oriented edges.
    * Integer-exact ⇒ a SQL oracle replays the count bit-for-bit.
    *
    * @return one row: (n_nodes, n_edges, n_wedges, n_triangles,
    *         clustering DOUBLE = 3·triangles / wedges, 0.0 when no wedges)
    */
  def triangleStats(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    // materialize the edge list ONCE (Lineage.cut): the census runs four
    // actions (orientation cut, triangle count, degree stats, edge count)
    // and each would otherwise recompute the caller's whole edge-builder
    // chain — measured 3-4x the census's own cost on a co-occurrence graph
    val e = Lineage.cut(edges.select(col(aCol).as("a"), col(bCol).as("b")))
    // undirected degree per node
    val deg = e.select(col("a").as("n")).union(e.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // orient: (u → v) iff (deg, id) of u < (deg, id) of v — a total order,
    // so exactly one direction survives per edge
    val da = deg.select(col("n").as("a"), col("d").as("da"))
    val db = deg.select(col("n").as("b"), col("d").as("db"))
    // merge hints: deg/oriented/outNbr are node/edge-cardinality — the
    // Dedup join-strategy contract (no corpus-sized side may broadcast)
    val oriented = e.join(da.hint("merge"), "a").join(db.hint("merge"), "b")
      .select(
        when(col("da") < col("db") ||
             (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .pipe(Lineage.cut) // referenced three times below: wedges ×2 + close
    // wedges pivoted at u: (x, y) with x < y IN THE ORIENTATION ORDER,
    // i.e. (deg, id) order — both out-neighbors of u sit above u, and the
    // closing edge between them (if any) is oriented from the smaller of
    // the two, so joining on the order-normalized pair misses nothing
    def key(n: org.apache.spark.sql.Column, d: org.apache.spark.sql.Column) =
      struct(d, n)
    val outNbr = oriented.join(db.withColumnRenamed("b", "v")
      .withColumnRenamed("db", "dv").hint("merge"), "v")
    val wedges = outNbr.select(col("u"), col("v").as("x"), col("dv").as("dx"))
      .join(outNbr.select(col("u"), col("v").as("y"), col("dv").as("dy"))
        .hint("merge"), "u")
      .filter(key(col("x"), col("dx")) < key(col("y"), col("dy")))
      .select(col("x"), col("y"))
    val nTri = wedges
      .join(oriented.select(col("u").as("x"), col("v").as("y")).hint("merge"),
        Seq("x", "y"), "left_semi")
      .count()
    // open wedge count uses RAW degrees: Σ d·(d-1)/2 (centered anywhere,
    // not just at the orientation pivot — the standard clustering denom).
    // (r17 note: fusing this aggregate and the triangle count into one
    // union'd action was tried and REVERTED — across three measurement
    // windows it never beat the committed anchor while executor-cpu read
    // up to +25%, and no window was clean enough to prove the fused plan's
    // job saving outweighed re-planning the shared deg/oriented subtrees
    // inside one action. The two-action shape is the one the committed
    // clean-window anchor validates; an unproven plan change on a census
    // this cheap is not worth the anchor risk.)
    val stats = deg.agg(
        count(lit(1)).as("n_nodes"),
        // handshake: m = Σd/2 — the edge count rides the same aggregate,
        // one fewer job; integer div (no IEEE round-trip), null-safe for
        // the empty graph
        expr("coalesce(sum(d), 0) div 2").as("n_edges"),
        expr("coalesce(sum(d * (d - 1)), 0) div 2").as("n_wedges"))
      .head()
    val nNodes = stats.getLong(0)
    val nEdges = stats.getLong(1)
    val nWedges = stats.getLong(2)
    val spark = edges.sparkSession
    import spark.implicits._
    Seq((nNodes, nEdges, nWedges, nTri,
      if (nWedges == 0) 0.0 else 3.0 * nTri / nWedges))
      .toDF("n_nodes", "n_edges", "n_wedges", "n_triangles", "clustering")
  }
}
