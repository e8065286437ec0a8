package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword search over a document corpus — the inverted-index/BM25 retrieval
  * shape, expressed as Spark joins so the planner sees plain equi-joins.
  *
  * Scoring is a fixed-point rational BM25 surrogate, chosen so the ranking is
  * integer-exact and therefore byte-identical across engines (the DuckDB
  * oracle replays the same integer arithmetic):
  *
  *   - the tf saturation term keeps the exact Robertson form with k1 = 6/5,
  *     b = 3/4. Substituting avgdl = L/N and clearing denominators gives the
  *     all-integer identity
  *       tf_component = 44·tf·L / (20·tf·L + 6·L + 18·N·dl)
  *     which is evaluated in fixed point: `tfc_fp = (44·tf·L·10^6) div (…)`.
  *   - idf replaces `ln((N − df + ½)/(df + ½))` with its (monotone-equivalent)
  *     argument in fixed point: `idf_fp = ((2(N−df)+1)·10^6) div (2df+1)`.
  *     Rankings agree with log-idf BM25 per term; cross-term sums weight rare
  *     terms more strongly than the log form — documented, deterministic, and
  *     never negative (a fixed-point convenience the log form lacks).
  *
  * Overflow bound: the widest product is 44·tf·L·10^6, safe in a signed long
  * up to L ≈ 2·10^11 corpus tokens; past that, move the fixed point to
  * DECIMAL(38,0) (same integer semantics, wider lanes).
  *
  * Scale shape (100 TB): the corpus-wide work is one tokenize pass feeding
  * two hash aggregations (postings and doc lengths). The per-query work is
  * bounded by the postings of the query terms: `queries` broadcasts into the
  * postings aggregate, so only matching (doc, term) rows flow into scoring,
  * and the df/ doclen joins are equi-joins on that already-filtered set.
  * Global corpus stats (N, L) are a bounded driver-side collect (two longs)
  * inlined as literals. No per-query corpus scan, no nested loop.
  */
object Search {

  /** Top-k BM25-surrogate retrieval.
    *
    * @param docs    corpus with `idCol` (numeric) and `textCol`
    * @param queries (query_id: long, term: string) — small, broadcast
    * @param k       results per query
    * @return (query_id, rnk, doc_id, score_fp, n_terms) — `score_fp` is the
    *         fixed-point score (10^6 = 1.0 per matched-term unit), `n_terms`
    *         the number of distinct query terms the document matched.
    *         Query terms absent from the corpus contribute nothing (standard
    *         disjunctive retrieval); queries with no matching docs yield no
    *         rows.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, k: Int): DataFrame = {
    val toks = docs.select(
      col(idCol).cast("long").as("doc_id"),
      explode(TF.tokens(col(textCol))).as("term"))
    val postings = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // doc-length table, MATERIALIZED once (Lineage.cut — 16 bytes/doc, the
    // classic doc-length file of an inverted index): it feeds the scoring
    // join AND the corpus-stats aggregate below, so the corpus is tokenized
    // once for lengths instead of once per consumer (r17: the plan carried
    // SIX parquet scans of the corpus — postings ×2, doclen, stats — now
    // two: one postings build, one doclen build).
    val doclen = Lineage.cut(docs.select(
      col(idCol).cast("long").as("doc_id"),
      TF.nTokens(col(textCol)).cast("long").as("dl")))
    // Corpus stats (N docs, L tokens) are two longs: collect them driver-side
    // — the same bounded-collect shape as the IVF codebook / bloom build —
    // so the scoring arithmetic constant-folds and the planner sees only
    // equi-joins (a 1-row stats cross join would plan as a nested loop and
    // trip the plan-audit gate for no benefit). Aggregated off the doclen
    // table (N = row count, L = Σ dl — identical by definition), so the
    // stats pass costs a doclen read, not a corpus re-tokenize.
    val statsRow = doclen.agg(
      count(lit(1)).as("n"),
      coalesce(sum(col("dl")), lit(0L)).as("l"))
      .head()
    val (nDocs, lTot) = (statsRow.getLong(0), statsRow.getLong(1))

    val qterms = queries.select(
      col("query_id").cast("long").as("query_id"), col("term"))
    // postings filtered to query terms FIRST: everything downstream is
    // bounded by the query terms' posting lists, not the corpus. The
    // filtered slice is CUT (bounded by the query terms' postings) because
    // it has two consumers — the per-query match rows and the df counts —
    // and each would otherwise re-run the corpus-wide postings aggregate
    // (the plan's second full scan+groupBy of the corpus, r17).
    val matchedBase = Lineage.cut(
      postings.join(broadcast(qterms.select("term").distinct()), "term"))
    val matched = matchedBase.join(broadcast(qterms), "term")
    // df per term over the already-filtered slice: identical to counting
    // postings rows per term corpus-wide for exactly those terms
    val dfq = matchedBase.groupBy("term").agg(count(lit(1)).as("df"))

    val scored = matched
      .join(broadcast(dfq), "term")
      // doclen is DOC-cardinality and matched is hot-term-unbounded: at
      // scale NEITHER side is safely broadcastable (join-strategy contract)
      .join(doclen.hint("merge"), "doc_id")
      .withColumn("idf_fp",
        expr(s"((2*(${nDocs}L - df) + 1) * 1000000L) div (2*df + 1)"))
      .withColumn("tfc_fp", expr(
        s"(44L*tf*${lTot}L*1000000L) div " +
          s"(20L*tf*${lTot}L + 6L*${lTot}L + 18L*${nDocs}L*dl)"))
      .withColumn("term_score", expr("(idf_fp * tfc_fp) div 1000000L"))

    scored.groupBy("query_id", "doc_id")
      .agg(sum("term_score").as("score_fp"), count(lit(1)).as("n_terms"))
      .withColumn("rnk", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("score_fp").desc, col("doc_id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("doc_id"), col("score_fp"), col("n_terms"))
  }
}
