package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus collocation mining: top adjacent-bigram associations ranked by a
  * fixed-point pointwise-mutual-information surrogate.
  *
  * The score is the PMI *lift* ratio in fixed point:
  *
  *   score_fp = (c_xy · T · 10^6) div (c_x · c_y)
  *
  * where c_xy is the bigram count, c_x/c_y the unigram token counts, and T
  * the total token count. True PMI is `ln` of (lift · T_bi⁻¹·T) up to the
  * constant bigram/token-total ratio; since `ln` is monotone and the factor
  * is corpus-constant, ranking by the rational lift is ranking by PMI —
  * with integer-exact, engine-portable arithmetic (no cross-engine `ln`
  * last-ulp hazard). Overflow: c_xy·T·10^6 is long-safe to T ≈ 3·10^9
  * tokens per (deterministic) corpus shard; widen to DECIMAL(38,0) past
  * that.
  *
  * Scale shape (100 TB): bigram extraction is a per-row array transform
  * inside the scan stage; unigram and bigram counts are two map-side-
  * combined hash aggs. Everything after the aggs operates on the
  * vocabulary-bounded counts table (vocab ≪ corpus), so the final global
  * ranking window runs over a table already shrunk by the aggregation —
  * the min-count filter is applied before the join so rare-pair noise
  * never reaches the ranking.
  */
object TextMining {

  /** Top-k collocations.
    *
    * @param docs     corpus with `textCol`
    * @param minCount minimum bigram count (PMI is noise below small counts)
    * @param k        number of top collocations
    * @return (rnk, w1, w2, c_xy, c_x, c_y, score_fp) ordered by
    *         (score_fp desc, w1, w2)
    */
  def pmiBigrams(docs: DataFrame, textCol: String,
                 minCount: Long, k: Int): DataFrame = {
    val toks = docs.select(TF.tokens(col(textCol)).as("ts"))
    // unigram counts, MATERIALIZED once (Lineage.cut — vocabulary-bounded):
    // they feed BOTH sides of the scored join and the total-token probe, so
    // the corpus is tokenized+exploded once instead of once per consumer
    // (r17: the plan carried SIX parquet scans of the corpus — uni ×2 via
    // the two join sides, the total agg, and the bigram pass — now two).
    val uni = Lineage.cut(toks.select(explode(col("ts")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c")))
    // total token count = Σ unigram counts (identical by definition),
    // collected driver-side (a single long, same bounded-collect shape as
    // the bloom build) and inlined — a 1-row cross join would plan as a
    // nested loop. Aggregating the vocabulary-bounded counts table costs a
    // uni read, not a corpus re-tokenize — and doubles as the cut's
    // materializing action.
    val total = uni.agg(coalesce(sum(col("c")), lit(0L)))
      .head().getLong(0)
    // bigram stream via the one-pass codegen kernel (r17): the
    // transform(sequence(...)) lambda evaluated every pair through
    // CodegenFallback eval
    val bi = toks
      .select(explode(graft.functions.TextExpressions.adjacentPairs(
        col("ts"))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)

    // merge hints on the unigram joins: BOTH sides are vocabulary-
    // cardinality (the Dedup join-strategy contract) — left to size stats,
    // AQE broadcast-promotes a compressed word-count table at mid scales
    // and the in-memory build is 3-5x larger (the r15 100x-rehearsal OOM
    // class). SMJ reuses the groupBy partitioning on the word keys.
    val scored = bi.join(uni.withColumnRenamed("w", "w1")
        .withColumnRenamed("c", "c_x").hint("merge"), "w1")
      .join(uni.withColumnRenamed("w", "w2")
        .withColumnRenamed("c", "c_y").hint("merge"), "w2")
      .withColumn("score_fp",
        expr(s"(c_xy * ${total}L * 1000000L) div (c_x * c_y)"))
    // global top-k via orderBy+limit: plans as TakeOrderedAndProject (each
    // task keeps its local k, driver merges k·partitions rows) — never a
    // single-partition sort of the full post-gate vocabulary. The rank over
    // the ≤ k survivors is a bounded collect_list + array_sort + posexplode,
    // NOT a window: a global-rank window has an empty partition spec (a
    // lit(0) key is constant-folded to the same thing), and that is
    // WindowExec's move-everything-to-one-partition shape — fine at k rows
    // but indistinguishable, in plan and in warning, from the scale-killer.
    val ord = "CASE WHEN a.score_fp > b.score_fp THEN -1 " +
      "WHEN a.score_fp < b.score_fp THEN 1 " +
      "WHEN a.w1 < b.w1 THEN -1 WHEN a.w1 > b.w1 THEN 1 " +
      "WHEN a.w2 < b.w2 THEN -1 WHEN a.w2 > b.w2 THEN 1 ELSE 0 END"
    scored.orderBy(col("score_fp").desc, col("w1"), col("w2")).limit(k)
      .agg(collect_list(struct(col("score_fp"), col("w1"), col("w2"),
        col("c_xy"), col("c_x"), col("c_y"))).as("xs"))
      .select(posexplode(expr(s"array_sort(xs, (a, b) -> $ord)")))
      .select((col("pos") + 1).cast("long").as("rnk"),
        col("col.w1").as("w1"), col("col.w2").as("w2"),
        col("col.c_xy").as("c_xy"), col("col.c_x").as("c_x"),
        col("col.c_y").as("c_y"), col("col.score_fp").as("score_fp"))
  }
}
