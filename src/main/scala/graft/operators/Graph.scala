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
    */
  def integerPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                      iters: Int, dampPct: Int = 85,
                      scale: Long = 1000000L): DataFrame = {
    require(iters >= 0 && iters <= 50, s"integerPageRank: iters=$iters")
    require(dampPct >= 0 && dampPct <= 100, s"integerPageRank: damp=$dampPct")
    require(scale > 0 && scale <= 1000000000L, s"integerPageRank: scale=$scale")
    val e = edges
      .select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
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
      val contrib = withDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr(s"(mass * $dampPct) div (100 * deg)").as("c"))
      ranks = contrib.union(zeros)
        .groupBy(col("node"))
        .agg((lit(base) + sum(col("c"))).as("mass"))
      // same pattern as Dedup.duplicateGroups: truncate the growing plan
      // every few rounds so round k doesn't recompute rounds 1..k-1
      if (i % 3 == 0 && i < iters) ranks = ranks.pipe(Lineage.cut)
    }
    ranks
  }
}
