package graft.operators

import graft.functions.{TextExpressions, TextFunctions, VectorFunctions}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}

/** Corpus-construction operators for training-data pipelines: deterministic
  * stratified sampling, token-budget mixture construction, benchmark
  * decontamination, and greedy sequence packing. These extend the engine
  * beyond the reference's CDC surface (see SURVEY.md §2.8 / §8.2) with the
  * steps an LLM-scale data pipeline runs after dedupe.
  *
  * All randomness is hash-derived (md5 of the id), so every operator is
  * reproducible run-to-run and replicable by a SQL oracle.
  */
object CorpusOps {

  /** Null/non-numeric ids otherwise hit the non-nullable Long slot of a
    * tuple encoder with Spark's opaque "null value appeared in non-nullable
    * field" — fail fast with the operator's name instead, lazily (the check
    * rides the scan; no probe job). Same contract as duplicateGroups /
    * winnowContainmentPairs.
    */
  private def checkedLongId(idCol: String, caller: String): Column = {
    val cast = col(idCol).try_cast("long")
    when(cast.isNull, raise_error(lit(
      s"$caller: non-numeric or null id in '$idCol' (cast to long gave null)")))
      .otherwise(cast).as(idCol)
  }

  /** One sampled candidate: `key` is the hash sort key, `id` the row id. */
  case class Pick(key: String, id: Long)
  case class PickBuf(items: Seq[Pick])

  private def insertMin(items: Seq[Pick], e: Pick, k: Int): Seq[Pick] = {
    // items kept sorted (key asc, id asc), length <= k
    if (items.size >= k) {
      val last = items.last
      if (e.key > last.key || (e.key == last.key && e.id >= last.id))
        return items
    }
    val (before, after) = items.span(x =>
      x.key < e.key || (x.key == e.key && x.id < e.id))
    (before ++ (e +: after)).take(k)
  }

  /** Bounded min-k by (string key, id) — same shuffle argument as
    * [[TopK.TopKAgg]]: partial aggregation keeps at most k candidates per
    * group per partition map-side, so sampling a fixed k per stratum from
    * 100 TB never materializes or sorts a whole stratum (a
    * `row_number().over(partitionBy(stratum))` would — and with a handful of
    * language strata, each window partition would be ~20 TB of skew).
    */
  class MinKAgg[G](k: Int) extends Aggregator[(G, Pick), PickBuf, PickBuf] {
    override def zero: PickBuf = PickBuf(Vector.empty)
    override def reduce(b: PickBuf, e: (G, Pick)): PickBuf =
      PickBuf(insertMin(b.items, e._2, k))
    override def merge(a: PickBuf, b: PickBuf): PickBuf =
      PickBuf(b.items.foldLeft(a.items)((acc, e) => insertMin(acc, e, k)))
    override def finish(b: PickBuf): PickBuf = b
    override def bufferEncoder: Encoder[PickBuf] = Encoders.product[PickBuf]
    override def outputEncoder: Encoder[PickBuf] = Encoders.product[PickBuf]
  }

  /** Deterministic stratified sample: the k rows per `groupCol` stratum with
    * the smallest md5(id) — a uniform-without-replacement sample that any
    * engine reproduces exactly. Output: (groupCol, idCol, rank), rank 1..k
    * in hash order.
    */
  def stratifiedSample(df: DataFrame, groupCol: String, idCol: String,
                       k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df
      .select(col(groupCol).cast("string"),
        md5(col(idCol).cast("string")), checkedLongId(idCol, "stratifiedSample"))
      .as[(String, String, Long)]
      .map { case (g, h, id) => (g, Pick(h, id)) }
    implicit val outEnc: Encoder[(String, PickBuf)] =
      Encoders.tuple(Encoders.STRING, Encoders.product[PickBuf])
    keyed.groupByKey(_._1)
      .agg(new MinKAgg[String](k).toColumn)
      .flatMap { case (g, buf) =>
        buf.items.zipWithIndex.map { case (p, i) => (g, p.id, i + 1L) }
      }
      .toDF(groupCol, idCol, "rank")
  }

  /** Token-budget corpus mixing: per stratum, admit documents in md5(id)
    * order while the running token total BEFORE the document is under
    * `quota` — so each stratum contributes ~quota tokens to the mixture and
    * the admitted set is deterministic. The boundary document is admitted
    * (quota is a low-water mark), so every stratum with any data reaches its
    * quota. Output: (groupCol, idCol, n_tokens, cum_before).
    *
    * Scale note: the prefix sum needs one window sort per stratum, but only
    * over rows surviving an (optional) pre-filter; for few large strata,
    * run [[stratifiedSample]]-style candidate pruning first — admitted rows
    * are a hash-prefix of the stratum, so any superset of the smallest
    * ~quota/avg_tokens hashes is a safe pre-filter.
    */
  def mixByTokenBudget(df: DataFrame, groupCol: String, idCol: String,
                       textCol: String, quota: Long): DataFrame =
    mixByTokenBudget(df, groupCol, idCol, textCol, quota,
      TextFunctions.nTokens(_).cast("long"))

  /** Variant with a pluggable token counter — budgets should be keyed to
    * the count the TRAINING RUN will see, so pass the real tokenizer
    * (e.g. `graft.functions.Bpe.bpeCount(_)`) instead of the whitespace
    * default when the downstream consumer is BPE-tokenized.
    */
  def mixByTokenBudget(df: DataFrame, groupCol: String, idCol: String,
                       textCol: String, quota: Long,
                       tokenCount: Column => Column): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col("_h"), col(idCol))
    // null text counts as 0 tokens EXPLICITLY — a null n_tokens would be
    // skipped by the window sum and the doc would ride in quota-free
    df.select(col(groupCol), col(idCol).cast("long").as(idCol),
        coalesce(tokenCount(col(textCol)).cast("long"), lit(0L))
          .as("n_tokens"),
        md5(col(idCol).cast("string")).as("_h"))
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens"))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("cum_before") < quota)
      .drop("_h")
  }

  /** Benchmark decontamination: flag training documents sharing at least one
    * distinct word n-gram with the evaluation set (`evalPred` rows).
    * Output: (doc_id, n_shared) for contaminated train docs only.
    *
    * The eval gram set is broadcast — benchmark suites are tiny next to a
    * 100 TB corpus, so the only shuffle is the final per-doc count; train
    * grams never exchange. Gram extraction reuses the distinct-shingle
    * kernel ([[VectorFunctions.shingleSet]]), one codegen call per doc.
    */
  def decontaminate(docs: DataFrame, evalPred: Column, idCol: String,
                    textCol: String, n: Int): DataFrame = {
    val grams = docs.select(col(idCol).cast("long").as("doc_id"),
      evalPred.as("is_eval"),
      explode(VectorFunctions.shingleSet(
        TextFunctions.tokens(col(textCol)), n)).as("gram"))
    val evalGrams = grams.filter(col("is_eval")).select("gram").distinct()
    grams.filter(!col("is_eval"))
      .join(broadcast(evalGrams), "gram")
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("gram")).as("n_shared"))
  }

  /** [[decontaminate]] for eval sets too large to broadcast raw: the eval
    * n-grams fold into ONE bloom-filter scalar ([[BloomJoin.buildBloom]] —
    * a mergeable aggregate, so only filter buffers shuffle, never gram
    * strings; ~1.2 MB per 10^6 grams at 1% fpp vs tens of bytes PER GRAM
    * broadcast raw), the corpus side prunes map-side against it inside the
    * scan's codegen stage, and the survivors — true hits plus the fpp
    * fringe — exact-verify against the eval grams in a plain SHUFFLED
    * equi-join: no broadcast of raw eval data anywhere, which is the whole
    * point at 10^9 eval grams.
    *
    * Result is EXACT — identical to [[decontaminate]] — because bloom
    * error is one-sided: a false positive survives the prefilter and dies
    * in the verify join; a false negative cannot exist. The equivalence is
    * a law in `CorpusOpsSpec`, and the query's oracle replays the plain
    * n-gram semantics, so the correctness gate pins the pruned plan to the
    * unpruned answer end to end.
    *
    * @param expectedEvalGrams bloom sizing hint; pass the (approximate)
    *        distinct eval gram count — overshooting costs bits, not
    *        correctness. The hint also steers the verify-join strategy, so
    *        it is only trusted as-is when it lands ABOVE the broadcast
    *        threshold (where it selects the scale-safe shuffled verify); a
    *        hint at or below it is re-measured with a real count before it
    *        may select a broadcast, so an undershot hint can never force
    *        the raw-eval broadcast this variant exists to avoid. Defaults
    *        to counting the eval grams (one extra pass over the SMALL
    *        side).
    */
  /** Largest measured eval-gram count for which [[decontaminateBloom]]'s
    * verify join may broadcast the eval grams (tens of MB); above it the
    * shuffled verify is the scale contract.
    */
  private val broadcastVerifyCap = 1000000L

  def decontaminateBloom(docs: DataFrame, evalPred: Column, idCol: String,
                         textCol: String, n: Int,
                         expectedEvalGrams: Long = -1L,
                         fpp: Double = 0.01): DataFrame = {
    val grams = docs.select(col(idCol).cast("long").as("doc_id"),
      evalPred.as("is_eval"),
      explode(VectorFunctions.shingleSet(
        TextFunctions.tokens(col(textCol)), n)).as("gram"))
    // cut: the distinct eval grams have up to three consumers (the sizing
    // count, the bloom build, the verify join) and each would otherwise
    // re-shingle the eval slice (r17); the cut table is the eval side —
    // bounded by the eval set, the small side by construction
    val evalGrams = Lineage.cut(
      grams.filter(col("is_eval")).select("gram").distinct())
    // A hint above the broadcast threshold is trusted as-is: it selects the
    // scale-safe shuffled verify and sizes the bloom (overshoot costs bits,
    // not correctness). A hint AT OR BELOW the threshold is re-measured
    // before it may select broadcast(evalGrams): an undershot hint against a
    // much larger real eval set would otherwise force the exact raw-eval
    // broadcast this variant exists to avoid.
    val items =
      if (expectedEvalGrams > broadcastVerifyCap) expectedEvalGrams
      else evalGrams.count()
    // zero eval grams: nothing can be contaminated, and a 0-item bloom is
    // ill-defined — short-circuit to the empty answer with the right schema
    if (items == 0)
      return grams.filter(lit(false)).groupBy(col("doc_id"))
        .agg(count_distinct(col("gram")).as("n_shared"))
    val bloom = BloomJoin.buildBloom(evalGrams, col("gram"), items, fpp)
    val survivors = grams.filter(!col("is_eval"))
      .filter(BloomJoin.mightContain(bloom, col("gram")))
      .select(col("doc_id"), col("gram"))
    // exact verify. The join strategy is PINNED from `items` — the eval
    // gram count the operator already holds — never left to the planner:
    // evalGrams sits directly over scan+explode, so its size estimate is
    // the pre-explode child's (the same explode-blind under-estimate that
    // made RecordLinkage.fuzzyJoin attempt a 15.6 GiB broadcast build),
    // and an unpinned auto-broadcast of raw eval grams could silently
    // return at exactly the scale this variant exists for. Below ~1M
    // grams (tens of MB) a broadcast is both scale-safe and measurably
    // cheaper than shuffling the survivors (the blanket shuffle_hash pin
    // cost 1.3x at sf0.1); past it the shuffled verify is the contract —
    // survivors are the bloom-thinned sliver, so the exchange is small.
    // `items` is a MEASURED count whenever this branch can fire (see above),
    // so the broadcast is keyed off a size the operator verified itself.
    val verifySide =
      if (items <= broadcastVerifyCap) broadcast(evalGrams)
      else evalGrams.hint("shuffle_hash")
    survivors.join(verifySide, "gram")
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("gram")).as("n_shared"))
  }

  /** SEMANTIC benchmark decontamination — the embedding-space complement of
    * the n-gram [[decontaminate]]: a paraphrased eval question shares no
    * 13-gram with its train-set leak, but the embeddings sit at cosine ≈ 1.
    * Flags every train vector whose cosine to ANY eval vector reaches
    * `threshold`, with the same blocked plan as
    * [[Dedup.semanticDedupPairs]] (SemDeDup, arXiv:2303.09540, applied
    * cross-set): md5-seeded coarse-quantizer cells over the WHOLE corpus,
    * then a train↔eval candidate join on (cell) only — the eval side of the
    * join is (id, cell) pairs, broadcast (an eval benchmark is thousands of
    * rows; the 100 TB side never shuffles more than its cell assignment) —
    * and exact-cosine verification re-attaches vectors by id for candidate
    * rows only. Output per contaminated train id: how many eval vectors it
    * matched and the smallest matching eval id (deterministic witness).
    *
    * A quantizer cell can split a true near-pair across cells (the same
    * recall boundary [[Dedup.semanticDedupPairs]] declares and
    * `ann_ivf_recall_audit` measures); raise nlist-to-probe or rerun with a
    * different seed family for belt-and-braces hygiene.
    *
    * `nlist = 0` selects auto mode ([[SimilaritySearch.resolveNlist]]): the
    * cell count re-derives from the corpus size each run, so a grown corpus
    * cannot silently turn the within-cell candidate stage quadratic. Pin
    * when a stable candidate set matters more than cost.
    */
  def decontaminateSemantic(emb: DataFrame, evalPred: Column, idCol: String,
                            vecCol: String, nlist: Int,
                            threshold: Double): DataFrame = {
    val nl = SimilaritySearch.resolveNlist(emb, nlist)
    val (flat, norms, dim) = SimilaritySearch.seedCentroids(
      emb, idCol, vecCol, nl, "decontaminateSemantic")
    val assigned = emb.select(col(idCol).as("id"), evalPred.as("is_eval"),
      VectorFunctions.nearestCentroid(col(vecCol), flat, norms, dim).as("cell"))
    val train = assigned.filter(!col("is_eval"))
      .select(col("id").as("train_id"), col("cell"))
    val evalSide = assigned.filter(col("is_eval"))
      .select(col("id").as("eval_id"), col("cell"))
    val vt = emb.select(col(idCol).as("train_id"), col(vecCol).as("_vt"))
    // eval rows ONLY: broadcasting the unfiltered corpus would ship the
    // 100 TB side to every executor (the inner join on eval_id would make
    // it merely correct, not survivable)
    val ve = emb.filter(evalPred)
      .select(col(idCol).as("eval_id"), col(vecCol).as("_ve"))
    train.join(broadcast(evalSide), "cell")
      .join(vt, "train_id")
      .join(broadcast(ve), "eval_id")
      .filter(VectorFunctions.cosine(col("_vt"), col("_ve")) >= threshold)
      .groupBy(col("train_id"))
      .agg(count(lit(1)).as("n_eval_hits"), min(col("eval_id")).as("eval_witness"))
  }

  /** Source×source contamination matrix: for every pair of corpus sources,
    * how many winnow fingerprints ([[VectorFunctions.winnowMd5]] — the same
    * oracle-replayable family `dedup_containment` uses) they share, plus
    * the fingerprint-set Jaccard. The corpus-level complement of the
    * doc-level containment operator: "how much does source A copy from
    * source B" is the first question a mixed-provenance 100 TB crawl asks.
    *
    * Plan: one winnow pass → per-source DISTINCT fingerprint sets (the
    * distinct is the only corpus-sized shuffle, keyed by (src, fp)); the
    * pair stage equi-joins on fp, so fanout per fingerprint is (#sources
    * carrying it)², and the aggregate is bounded by |sources|² keys —
    * sources number thousands at 100 TB, not billions. For adversarial
    * universal boilerplate (a fingerprint in nearly every source),
    * `maxSrcDf` drops fingerprints carried by more than that many sources
    * — the df-cap argument of [[Dedup.winnowContainmentPairs]] one level
    * up; such grams carry no pairwise signal anyway.
    */
  def sourceOverlapMatrix(docs: DataFrame, srcCol: String, textCol: String,
                          n: Int, w: Int,
                          maxSrcDf: Int = Int.MaxValue): DataFrame = {
    // cut: the distinct (src, fp) table has three consumers (denominator
    // counts + both inverted-index join sides) and each would otherwise
    // re-run the corpus winnow pass (r17)
    val fps = Lineage.cut(docs.select(col(srcCol).cast("string").as("src"),
        explode(VectorFunctions.winnowMd5(
          TextFunctions.tokens(col(textCol)), n, w)).as("fp"))
      .distinct())
    val capped =
      if (maxSrcDf == Int.MaxValue) fps
      else fps.join(fps.groupBy("fp").agg(count(lit(1)).as("_df"))
          .hint("merge"), "fp")
        .filter(col("_df") <= maxSrcDf).select("src", "fp")
    val denom = capped.groupBy("src").agg(count(lit(1)).as("n_fp"))
    val a = capped.select(col("src").as("src_a"), col("fp"))
    val b = capped.select(col("src").as("src_b"), col("fp"))
    // merge hints: the fp-df table and both inverted-index sides are
    // corpus-cardinality (the Dedup join-strategy contract)
    a.join(b.hint("merge"), "fp").filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(denom.select(col("src").as("src_a"), col("n_fp").as("n_fp_a")), "src_a")
      .join(denom.select(col("src").as("src_b"), col("n_fp").as("n_fp_b")), "src_b")
      .withColumn("jaccard", col("n_shared").cast("double") /
        (col("n_fp_a") + col("n_fp_b") - col("n_shared")).cast("double"))
      .select("src_a", "src_b", "n_shared", "n_fp_a", "n_fp_b", "jaccard")
  }

  /** Per-domain document cap — the web-pipeline "at most `cap` documents
    * per registered domain" policy (used to stop any one site dominating a
    * crawl-derived corpus), expressed skew-safely. Keeps the `cap` best
    * documents per source under the deterministic total order
    * (`scoreCol` DESC, id ASC).
    *
    * A naive `row_number() OVER (PARTITION BY source ...)` puts an entire
    * hot domain in one task — the exact skew a cap exists to fight. So the
    * cap runs in two phases:
    *   1. pre-prune within (source, salt-bucket): md5(id) mod `buckets`
    *      splits each source ~evenly; a per-(source, bucket) window keeps
    *      the top `cap` of each bucket, bounding every task at
    *      ~|source|/buckets rows whatever the domain skew;
    *   2. final per-source window over the ≤ buckets·cap survivors.
    * Phase 2 is exact because the true per-source top-cap rows are each
    * top-cap within their own bucket — the union of phase-1 survivors is a
    * superset of the answer.
    *
    * Output: (srcCol, idCol, scoreCol, rank), rank 1..cap per source.
    */
  def domainCap(docs: DataFrame, srcCol: String, idCol: String,
                scoreCol: String, cap: Int, buckets: Int = 64): DataFrame = {
    require(cap > 0 && buckets > 0, s"domainCap: cap=$cap buckets=$buckets")
    val order = Seq(col(scoreCol).desc, col(idCol).asc)
    val bucket = pmod(conv(substring(
      md5(col(idCol).cast("string")), 1, 15), 16, 10).cast("long"),
      lit(buckets.toLong))
    val pruned = docs
      .select(col(srcCol), col(idCol), col(scoreCol))
      .withColumn("_b", bucket)
      .withColumn("_r", row_number().over(
        Window.partitionBy(col(srcCol), col("_b")).orderBy(order: _*)))
      .filter(col("_r") <= cap)
    pruned
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(srcCol)).orderBy(order: _*)))
      .filter(col("rank") <= cap)
      .select(col(srcCol), col(idCol), col(scoreCol), col("rank").cast("long"))
  }

  /** Weighted Bernoulli (probability-proportional-to-size) selection:
    * document i is kept iff
    *     hash60(salt|id) · den · wmax  <  w_i · num · 2^60
    * i.e. with probability (num/den) · w_i / wmax — sampling "tokens
    * proportional to quality" without a shuffle: the decision is one
    * map-side integer comparison. All four factors are exact integers and
    * the products stay far under 10^38, so the comparison is computed in
    * DECIMAL(38,0) with NO floating point anywhere — a SQL oracle (DuckDB
    * HUGEINT) replays bit-for-bit exactly.
    *
    * `wmax` must be the (pre-computed) max weight: passing it in keeps the
    * operator a pure map (the caller aggregates once and reuses it across
    * incremental runs — re-deriving it here would make retention of a doc
    * depend on later data). Weights must be in [0, wmax], wmax ≤ 10^12,
    * num/den ≤ 1.
    *
    * Output: input columns + `keep` (boolean); filter downstream or keep
    * the flag for an audit. Deterministic in (salt, id).
    */
  def weightedBernoulli(docs: DataFrame, idCol: String, weightCol: String,
                        salt: String, wmax: Long, num: Long,
                        den: Long): DataFrame = {
    require(wmax > 0 && wmax <= 1000000000000L,
      s"weightedBernoulli: wmax=$wmax out of (0, 1e12]")
    require(num >= 0 && den > 0 && num <= den,
      s"weightedBernoulli: need 0 <= num/den <= 1, got $num/$den")
    val dec = "decimal(38,0)"
    val hash60 = conv(substring(
      md5(concat_ws("|", lit(salt), col(idCol).cast("string"))), 1, 15),
      16, 10).cast("long")
    val lhs = hash60.cast(dec) * lit(den).cast(dec) * lit(wmax).cast(dec)
    val rhs = col(weightCol).cast("long").cast(dec) * lit(num).cast(dec) *
      lit(1152921504606846976L).cast(dec) // 2^60
    docs.withColumn("keep", lhs < rhs)
  }

  /** Greedy sequence packing: within each stratum, walk documents in id
    * order and append to the current bin while it stays within `budget`
    * tokens; otherwise open a new bin. A document larger than the budget
    * gets a bin of its own (never split). Output:
    * (groupCol, idCol, n_tokens, bin_id) — bin ids dense per stratum.
    *
    * Packing is inherently sequential per stratum (bin state threads through
    * the walk), so parallelism is across strata; at 100 TB, pack within
    * finer strata (e.g. source × day) so no single group exceeds one task.
    */
  def packSequences(df: DataFrame, groupCol: String, idCol: String,
                    textCol: String, budget: Long): DataFrame =
    packSequences(df, groupCol, idCol, textCol, budget,
      TextFunctions.nTokens(_).cast("long"))

  /** Variant with a pluggable token counter (see [[mixByTokenBudget]]) —
    * bin capacities keyed to the real tokenizer's counts.
    */
  def packSequences(df: DataFrame, groupCol: String, idCol: String,
                    textCol: String, budget: Long,
                    tokenCount: Column => Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // null text packs as a 0-token doc; null id fails fast (encoder slots
    // below are non-nullable Longs)
    df.select(col(groupCol).cast("string"),
        checkedLongId(idCol, "packSequences"),
        coalesce(tokenCount(col(textCol)).cast("long"), lit(0L)))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        val docs = it.toVector.sortBy(_._2)
        var bin = 0L; var fill = 0L
        docs.iterator.map { case (_, id, toks) =>
          if (fill > 0 && fill + toks > budget) { bin += 1; fill = 0L }
          fill += toks
          (g, id, toks, bin)
        }
      }
      .toDF(groupCol, idCol, "n_tokens", "bin_id")
  }

  /** Gopher-style within-document repetition metrics (Rae et al. 2021,
    * arXiv:2112.11446, Table A1): the quality-filter signals that flag
    * template/spam documents without any cross-doc state —
    *  - `dup_line_frac`: fraction of line occurrences that are repeats of
    *    an earlier identical line in the same doc;
    *  - `dup_line_char_frac`: fraction of characters inside those repeated
    *    occurrences;
    *  - `top_2gram_frac`: occurrence share of the doc's most frequent word
    *    2-gram (ties break to the more frequent count only — the max is
    *    over counts, so ties don't matter).
    *
    * Shape: one explode + two hash aggs per metric family, joined on
    * doc_id; nothing is quadratic, nothing sorts per doc (the top gram is
    * a max over counts, not a window). All arithmetic is exact-integer
    * ratios emitted as doubles — deterministic IEEE division both engines
    * reproduce bit-for-bit.
    *
    * `delim` affects the LINE metrics only; the 2-gram metric always
    * tokenizes the raw text on whitespace (Gopher defines it over the word
    * stream, independent of line structure). A non-whitespace `delim` will
    * therefore leave delimiter characters inside gram tokens — use it for
    * the line metrics alone.
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String,
                      delim: String = "\n"): DataFrame = {
    // coalesce: explode(split(null)) drops the doc entirely (same contract
    // fix as Dedup.lineDedupe)
    val lines = docs.select(col(idCol).as("doc_id"),
      explode(split(coalesce(col(textCol), lit("")), delim)).as("line"))
    val perLine = lines.groupBy("doc_id", "line")
      .agg(count(lit(1)).as("c"), max(length(col("line"))).as("len"))
    val lineAgg = perLine.groupBy("doc_id").agg(
      sum(col("c")).as("n_lines"),
      (sum(col("c")) - count(lit(1))).as("n_dup_lines"),
      sum((col("c") - 1) * col("len")).as("dup_chars"),
      sum(col("c") * col("len")).as("total_chars"))
    val grams = docs.select(col(idCol).as("doc_id"),
      explode(Dedup.shingles(coalesce(col(textCol), lit("")), 2)).as("g"))
    val perGram = grams.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
    val gramAgg = perGram.groupBy("doc_id").agg(
      max(col("c")).as("top_c"), sum(col("c")).as("n_grams"))
    lineAgg.join(gramAgg, Seq("doc_id"))
      .select(col("doc_id"), col("n_lines"),
        (col("n_dup_lines").cast("double") / col("n_lines")).as("dup_line_frac"),
        coalesce(when(col("total_chars") > 0,
            col("dup_chars").cast("double") / col("total_chars")),
          lit(0.0)).as("dup_line_char_frac"),
        (col("top_c").cast("double") / col("n_grams")).as("top_2gram_frac"))
  }

  // DSIR feature stream + gram bucketing now live in Kernels.dsirBuckets /
  // dsirScoreSum (r17): unigrams + word bigrams WITH multiplicity (empty
  // text → no grams; single word → one unigram — NOT Dedup.shingles, whose
  // short-doc whole-text convention would double-count the unigram), md5
  // family = the oracle-replicable 60-bit hash, non-md5 = xxhash64 (the
  // production family when no SQL oracle replays the buckets, the
  // Dedup.simhashPairs `md5` flag convention).

  /** floor(log2(x)) + 1 for positive x — the integer "binary magnitude". */
  private def blen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)

  /** Importance weighting for domain-targeted data selection — the DSIR
    * shape (Xie et al., arXiv:2302.03169): score every document of `raw` by
    * a log-likelihood ratio of its hashed n-gram features (unigrams +
    * bigrams, `buckets` hash buckets, add-1 smoothing) under the `target`
    * domain's gram distribution vs the raw corpus's own. High score = the
    * doc looks like the target domain; resample/filter on it to tilt a
    * 100 TB crawl toward a quality domain.
    *
    * EXACTNESS: instead of float `ln`, the per-bucket log-ratio is
    * quantized to the BASE-2 INTEGER MAGNITUDE — `blen(n) = floor(log2 n)+1`
    * of the smoothed counts — so every score is an exact integer sum,
    * order-independent and bit-replayable by a SQL oracle (cross-engine
    * float `ln` differs in the last ulp; a quantized LLR cannot). The
    * quantization costs < 1 bit of per-gram resolution against true DSIR —
    * the ranking it induces is the point, and that survives.
    *
    * Scale shape: two B-bounded hash aggregations (map-side partials; B is
    * `buckets`, thousands) + one driver collect of ≤ 2B longs (same bounded
    * pattern as the IVF codebooks) + a pure map-side per-doc pass — the
    * per-bucket weight table rides as a broadcast map literal, so the
    * scoring pass never shuffles at all.
    *
    * Output: (doc_id, n_grams, llr2) where
    * `llr2 = Σ_g [blen(t_b+1) − blen(r_b+1)] + n_grams·[blen(R+B) − blen(T+B)]`
    * with t/r the per-bucket target/raw gram counts and T/R their totals.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
                        textCol: String, buckets: Int,
                        md5Family: Boolean = true): DataFrame = {
    // both corpora count in ONE job: union the tagged gram streams and split
    // the counts in the aggregate — one B-bounded shuffle and one driver
    // round-trip instead of two (each side is still scanned exactly once).
    // Buckets come from the one-pass codegen kernel (r17: the
    // explode(dsirGrams)+md5/conv route evaluated every gram through a
    // CodegenFallback higher-order lambda plus a hex-string md5 round-trip —
    // measured 56 executor-cpu-s/run on the sf0.1 query; Kernels.dsirBuckets
    // hashes gram bytes directly, same md5hash60 == conv(substring(md5..))
    // arithmetic, bit-identical buckets)
    def taggedBuckets(df: DataFrame, tag: Int): DataFrame =
      df.select(explode(TextExpressions.dsirBuckets(
          TextFunctions.tokens(col(textCol)), buckets, md5Family)).as("b"),
        lit(tag).as("t"))
    val counts = taggedBuckets(raw, 0).union(taggedBuckets(target, 1))
      .groupBy("b").agg(count(lit(1)).as("n"), sum(col("t")).as("tc"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val rawCounts = counts.map { case (b, (n, tc)) => b -> (n - tc) }
    val tgtCounts = counts.collect { case (b, (_, tc)) if tc > 0 => b -> tc }
    val offset = blen(rawCounts.values.sum + buckets) -
      blen(tgtCounts.values.sum + buckets)
    // dense weight table over ALL B buckets, indexed by bucket; unseen
    // buckets get blen(1)-blen(1) = 0, the correct add-1-smoothed weight.
    // r17: the table now rides as a codegen REFERENCE OBJECT inside
    // Kernels.dsirScoreSum (the NearestCentroid pattern) instead of an
    // array literal consumed by an interpreted aggregate(...) lambda — the
    // scoring pass is one static call per document in the scan's codegen
    // stage (the previous element_at-on-literal note stands: this is the
    // same O(1) positional access, minus the CodegenFallback per-gram eval
    // and the md5 hex round-trip). Scores are exact integer sums either
    // way — bit-identical output.
    val lwArr: Array[Long] = Array.tabulate(buckets) { b =>
      blen(tgtCounts.getOrElse(b.toLong, 0L) + 1) -
        blen(rawCounts.getOrElse(b.toLong, 0L) + 1)
    }
    val toks = TextFunctions.tokens(col(textCol))
    // n_grams = |unigrams| + |bigrams| = 2m-1 for m >= 2, else m — the exact
    // size of the dsirGrams multiset, without materializing it
    val nGrams = when(size(toks) >= 2,
      size(toks).cast("long") * 2 - 1).otherwise(size(toks).cast("long"))
    raw.select(checkedLongId(idCol, "importanceWeights"),
      nGrams.as("n_grams"),
      (TextExpressions.dsirScoreSum(toks, lwArr, md5Family) +
        nGrams * lit(offset)).as("llr2"))
  }

  /** Per-doc (id, w1, w2) adjacent-token pairs; docs with < 2 tokens emit
    * no rows (re-attached by [[ngramLmBits]]'s final left join).
    */
  private def adjacentPairs(df: DataFrame, idCols: Seq[Column],
                            textCol: String): DataFrame =
    // one codegen kernel call per doc (r17): the transform(sequence(...))
    // lambda route evaluated every pair through CodegenFallback eval —
    // measured as the dominant per-task cost of the corpus_perplexity gram
    // pass. < 2 tokens → empty array, explode drops the row (the old
    // filter(size >= 2) made the same rows vanish).
    df.select(idCols :+ explode(TextExpressions.adjacentPairs(
        TextFunctions.tokens(col(textCol)))).as("_g"): _*)
      .select(idCols :+ col("_g.w1") :+ col("_g.w2"): _*)

  /** CCNet-shape n-gram language-model quality scoring (Wenzek et al. 2020,
    * arXiv:1911.00359): train an add-one-smoothed bigram LM on the in-domain
    * slice `trainPred` selects, then score EVERY document by its total model
    * bits — low bits-per-gram ≈ fluent in-domain text (CCNet's "head"
    * bucket), high ≈ out-of-domain or noise. The paper's float log-probs are
    * quantized to INTEGER binary magnitudes (the [[importanceWeights]]
    * convention): `bits(w1,w2) = blen(cc(w1)+V) − blen(bc(w1,w2)+1)` with
    * `blen(n) = floor(log2 n)+1`, so every score is an exact,
    * order-independent integer sum both engines reproduce bit-for-bit — no
    * float `ln` anywhere.
    *
    * LM definition: `bc(w1,w2)` = adjacent-pair occurrences in the train
    * slice, `cc(w1) = Σ_w2 bc` (occurrences as a context), `V` = distinct
    * successor vocabulary. Add-one: `p(w2|w1) = (bc+1)/(cc+V)`; an unseen
    * context scores the uniform floor `blen(V)`. `minCount` prunes the
    * broadcast bigram table — pruned pairs fall back to the unseen-pair
    * path, the standard hash-LM memory dial — while `cc` and `V` keep their
    * unpruned totals, so pruning only coarsens the model, never skews the
    * denominator.
    *
    * Scale: the LM is two vocabulary-bounded hash aggs over the train slice
    * plus a 1-long driver collect (V — the IVF-codebook pattern); the
    * corpus-wide pass is explode → two broadcast left joins → one
    * map-side-combined per-doc agg. No corpus-sized key ever shuffles (same
    * plan class as [[decontaminate]]).
    *
    * Output: (idCol, n_grams, total_bits, bits_per_gram), one row per input
    * doc; docs with < 2 tokens score (0, 0, null).
    */
  def ngramLmBits(docs: DataFrame, trainPred: Column, idCol: String,
                  textCol: String, minCount: Long = 1L): DataFrame = {
    // cut: the bigram-count table has THREE consumers (the pruned bc
    // broadcast, the cc context sums, and the V vocabulary count) and each
    // re-ran the train-slice tokenize+explode+agg (r17); the cut table is
    // train-vocabulary-bounded and the V count below is its materializing
    // action
    val bcAll = Lineage.cut(
      adjacentPairs(docs.filter(trainPred), Seq.empty, textCol)
        .groupBy("w1", "w2").agg(count(lit(1)).as("bc")))
    val cc = bcAll.groupBy("w1").agg(sum("bc").as("cc"))
    val v = bcAll.agg(count_distinct(col("w2"))).head.getLong(0)
    require(v > 0, "ngramLmBits: train slice has no bigrams")
    val bc = bcAll.filter(col("bc") >= minCount)
    // blen of a positive BIGINT as a codegen Column: digits of bin(x)
    def blenC(x: Column): Column = length(bin(x)).cast("long")
    val scored = adjacentPairs(docs,
        Seq(checkedLongId(idCol, "ngramLmBits")), textCol)
      .join(broadcast(bc), Seq("w1", "w2"), "left")
      .join(broadcast(cc), Seq("w1"), "left")
      .withColumn("_bits",
        blenC(coalesce(col("cc"), lit(0L)) + lit(v)) -
          blenC(coalesce(col("bc"), lit(0L)) + lit(1L)))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"), sum(col("_bits")).as("total_bits"))
    docs.select(checkedLongId(idCol, "ngramLmBits"))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("total_bits"), lit(0L)).as("total_bits"),
        when(col("n_grams").isNull, lit(null).cast("double"))
          .otherwise(col("total_bits").cast("double") /
            col("n_grams").cast("double")).as("bits_per_gram"))
  }

  /** Deterministic train/val/test assignment: the doc's md5 60-bit hash
    * (salted, so re-splitting with a new salt is a fresh draw) modulo 100
    * places it in val (first `valPct` buckets), test (next `testPct`), or
    * train (the rest). Hash-based splitting is what makes a 100 TB split
    * reproducible, join-free, and stable under corpus growth — a doc's
    * assignment never depends on what other docs exist (contrast
    * `randomSplit`, which is seed- AND partitioning-dependent). Pure
    * map-side: no shuffle, no state, replayable by any engine with md5.
    */
  def hashSplit(docs: DataFrame, idCol: String, salt: String,
                valPct: Int = 5, testPct: Int = 5): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct <= 100,
      s"hashSplit: valPct=$valPct testPct=$testPct must sum within 100")
    val bucket = pmod(conv(substring(
      md5(concat_ws("|", lit(salt), col(idCol).cast("string"))), 1, 15),
      16, 10).cast("long"), lit(100L))
    docs.withColumn("split",
      when(bucket < valPct, lit("val"))
        .when(bucket < valPct + testPct, lit("test"))
        .otherwise(lit("train")))
  }

  /** The 60-bit salted md5 draw every CorpusOps sampler uses — one
    * definition so shard/order/split all agree on the hash family.
    */
  private def saltedHash60(idCol: String, salt: String): Column =
    conv(substring(
      md5(concat_ws("|", lit(salt), col(idCol).cast("string"))), 1, 15),
      16, 10).cast("long")

  /** Deterministic training-shard layout — the pipeline's LAST step: after
    * dedupe/filter/mix, training wants the corpus as N fixed shards in a
    * stable pseudorandom order. `shard = hash60(salt|id) mod nShards` is
    * pure map-side; `pos` (the doc's offset within its shard file) is a
    * window partitioned by shard, so the sort parallelizes across shards
    * and the worst task holds corpus/nShards rows — pick nShards at or
    * above cluster parallelism and no single-partition stage exists. The
    * physical write is `partitionBy(shard)` + the same (hash, id) sort
    * order; assignment is stable under corpus growth (a new doc never moves
    * an old one's shard, only its pos within one shard).
    */
  def shardByHash(docs: DataFrame, idCol: String, salt: String,
                  nShards: Int): DataFrame = {
    require(nShards > 0, s"shardByHash: nShards=$nShards must be positive")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("_h"), col(idCol))
    docs.select(col(idCol), saltedHash60(idCol, salt).as("_h"))
      .withColumn("shard", pmod(col("_h"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("_h")
  }

  /** Exact global rank in hash order — the full training permutation as ONE
    * number per doc — without the classic scale-killer (`row_number() OVER
    * (ORDER BY h)` is a single-partition window). Two phases, both bounded:
    * range-bucket on the hash's TOP bits (uniform 60-bit hash → balanced
    * buckets, and bucketing is deterministic, unlike Spark's sampled range
    * partitioner); rank locally per bucket (windows parallel across
    * buckets); then add per-bucket prefix offsets — a `buckets`-row
    * aggregate collected once and re-broadcast as a map literal (the DSIR
    * weight-table pattern). gpos is bucket-independent: buckets only split
    * the sort, never reorder it, so the result equals the one-task
    * row_number at any bucket count (pinned in spec at 1/7/64).
    */
  def globalOrderIndex(docs: DataFrame, idCol: String, salt: String,
                       buckets: Int = 1024): DataFrame = {
    require(buckets > 0, s"globalOrderIndex: buckets=$buckets must be positive")
    val keyed = docs
      .select(col(idCol), saltedHash60(idCol, salt).as("_h"))
      // top bits = range bucket: h uniform on [0, 2^60) → floor(h / step),
      // exact integer `div` like every other hash bucketing in the repo
      // (float `/` + cast is monotone here too, but exact-by-construction
      // beats relying on IEEE rounding being monotone)
      .withColumn("_b", expr(s"_h div ${(1L << 60) / buckets}"))
    val offsets = keyed.groupBy(col("_b")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    val prefix = offsets.scanLeft(0L)(_ + _._2)
    val offsetMap = offsets.map(_._1).zip(prefix).toMap
    // empty corpus → zero-arg map() types as MAP<NULL,NULL> and fails
    // element_at analysis; a dummy entry keeps the (never-evaluated) type sane
    val entries = if (offsetMap.isEmpty) Seq(0L -> 0L)
                  else offsetMap.toSeq.sortBy(_._1)
    val offsetLit = map(entries.flatMap {
      case (b, off) => Seq(lit(b), lit(off)) }: _*)
    val w = Window.partitionBy(col("_b")).orderBy(col("_h"), col(idCol))
    keyed
      .withColumn("gpos",
        element_at(offsetLit, col("_b")) + row_number().over(w).cast("long"))
      .drop("_h", "_b")
  }
}
