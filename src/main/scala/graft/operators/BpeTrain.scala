package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary TRAINING (Sennrich et al. 2016, the algorithm
  * behind the GPT-2 tokenizer family — public): learn the merges table that
  * [[graft.functions.BpeTable]] applies. The complement of the round-9
  * applier: trainer learns the table from the corpus, applier tokenizes with
  * it, and the learned table is valid-by-construction for the applier's
  * constructor invariant (every rule's sides are single characters or
  * products of strictly earlier rules).
  *
  * Shape, which is also the production-trainer shape (e.g. the
  * word-frequency optimization in the original Sennrich implementation):
  *   1. ONE linear pass over the corpus builds a word-frequency table —
  *      a map-side-combine hash agg, the only stage that sees the 100 TB.
  *   2. The table is capped to the top `maxWords` words (freq desc, word) —
  *      a bounded TakeOrdered; by Heaps' law the full vocabulary is corpus-
  *      sublinear anyway, and every subsequent round runs on THIS table,
  *      never the corpus.
  *   3. Each merge round = one adjacent-pair count (hash agg over the word
  *      table, overlapping occurrences weighted by word frequency — the
  *      classic get_stats), one 1-row argmax collect (count desc, then
  *      lexicographic (x, y) — deterministic), and one leftmost
  *      non-overlapping merge application.
  *
  * Merge application is a single literal `replace` per round on a
  * delimiter-encoded symbol string: a word's symbols are separated by TWO
  * spaces with ONE space at each end (`"the"` → `" t  h  e "`), and merging
  * (x, y) replaces `" x  y "` with `" xy "`. Each match consumes one space
  * of each flanking boundary and re-emits it, so boundaries stay intact and
  * consecutive occurrences merge greedily left-to-right — exactly the BPE
  * application rule — while multi-character symbols can never false-match
  * inside a neighbor (the pattern's flanking spaces only align at symbol
  * boundaries). This encoding is what makes the trainer SQL-replayable: the
  * oracle runs the same replace per unrolled round.
  */
object BpeTrain {

  /** Lineage-truncation cadence for the merge loop (rounds per cut). */
  val CutEvery = 8

  /** Test probe: largest logical-plan node count the round frame reached
    * during the most recent [[train]] call. The [[CutEvery]] cut bounds it
    * at O(CutEvery) regardless of round count; an O(rounds) reading means
    * the cut regressed. Written only by train(), read by BpeTrainSpec's
    * structural tripwire (a wall-clock bound was flaky on loaded hosts).
    */
  private[operators] var lastMaxPlanNodes: Int = 0

  /** One learned rule: merge rank (1-based), its sides, and the weighted
    * pair count that won the round.
    */
  final case class LearnedMerge(step: Int, x: String, y: String, cnt: Long)

  /** The capped word-frequency table with the initial symbol encoding:
    * (w, freq, s) where `s` is the delimiter-encoded character sequence.
    * Words are lowercase `[a-z]{2,}` runs — the clean-token subset every
    * published BPE recipe trains on after pre-tokenization.
    */
  def wordTable(docs: DataFrame, textCol: String, maxWords: Int): DataFrame =
    docs
      .select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(col("w").rlike("^[a-z]+$") && length(col("w")) >= 2)
      .groupBy(col("w"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w"))
      .limit(maxWords)
      .select(col("w"), col("freq"),
        regexp_replace(col("w"), "(.)", " $1 ").as("s"))

  /** Learn `nMerges` rules. Driver-side result by necessity — each round's
    * argmax IS a 1-row collect (declared bounded: nMerges rows total), and
    * the merges table is the KB-sized artifact that ships to the applier.
    * Rounds iterate on the CACHED word table (freed on exit); per-round
    * lineage is a chain of `replace` columns over it, TRUNCATED every
    * [[CutEvery]] rounds ([[Lineage.cut]] — the `duplicateGroups`/PageRank
    * discipline): without the cut, round k re-executes k string passes and
    * the plan tree grows linearly, which at a production vocabulary
    * (32k merges) is O(k²) work and a 10⁴-node plan. With it, each argmax
    * re-runs at most [[CutEvery]] replaces over the checkpointed word
    * table, so total work stays linear in rounds.
    */
  def train(docs: DataFrame, textCol: String, nMerges: Int = 12,
            maxWords: Int = 2000): Seq[LearnedMerge] = {
    val wf = wordTable(docs, textCol, maxWords).cache()
    lastMaxPlanNodes = 0
    try {
      val out = scala.collection.mutable.ArrayBuffer.empty[LearnedMerge]
      var cur = wf
      var k = 1
      var exhausted = false
      while (k <= nMerges && !exhausted) {
        val syms = cur.select(col("freq"), split(trim(col("s")), "  ").as("l"))
        val pairs = syms
          .filter(size(col("l")) >= 2)
          .select(col("freq"), explode(zip_with(
            slice(col("l"), lit(1), size(col("l")) - 1),
            slice(col("l"), lit(2), size(col("l")) - 1),
            (a, b) => struct(a.as("x"), b.as("y")))).as("p"))
          .groupBy(col("p.x").as("x"), col("p.y").as("y"))
          .agg(sum(col("freq")).as("cnt"))
        val win = pairs.orderBy(col("cnt").desc, col("x"), col("y"))
          .limit(1).collect()
        if (win.isEmpty) exhausted = true
        else {
          val x = win(0).getString(0); val y = win(0).getString(1)
          out += LearnedMerge(k, x, y, win(0).getLong(2))
          cur = cur.withColumn("s",
            expr(s"replace(s, ' $x  $y ', ' $x$y ')"))
          // lazy cut: the next round's argmax collect is the materializing
          // job, so cut + argmax cost one job, not two
          if (k % CutEvery == 0) cur = Lineage.cut(cur)
          lastMaxPlanNodes = math.max(lastMaxPlanNodes,
            cur.queryExecution.logical.collect { case p => p }.size)
          k += 1
        }
      }
      out.toSeq
    } finally wf.unpersist(blocking = false)
  }

  /** [[train]] as a DataFrame (step, x, y, merged, cnt) — the driver-query
    * surface. `merged` rides along so the output doubles as a vocabulary
    * listing.
    */
  def trainDF(spark: SparkSession, docs: DataFrame, textCol: String,
              nMerges: Int = 12, maxWords: Int = 2000): DataFrame = {
    import spark.implicits._
    train(docs, textCol, nMerges, maxWords)
      .map(m => (m.step.toLong, m.x, m.y, m.x + m.y, m.cnt))
      .toDF("step", "x", "y", "merged", "cnt")
  }

  /** The DuckDB replay of [[train]]: `nMerges` unrolled rounds, each a
    * (pair-count, argmax, replace) CTE triple over the same encoding.
    * Every multiply-referenced CTE is MATERIALIZED — DuckDB inlines CTE
    * references, and the w-chain is referenced twice per round, which
    * would otherwise re-execute the prefix exponentially.
    */
  def oracleSql(nMerges: Int = 12, maxWords: Int = 2000): String = {
    // cnt > 0 drops the exhaustion sentinels (cnt = -1) so the learned-rule
    // listing matches trainDF, which stops emitting on exhaustion
    val union = (1 to nMerges)
      .map(k => s"SELECT step, x, y, cnt FROM m$k WHERE cnt > 0")
      .mkString("\n  UNION ALL ")
    s"""WITH ${oracleCtes(nMerges, maxWords)}
       |SELECT CAST(step AS BIGINT) AS step, x, y, x || y AS merged,
       |  CAST(cnt AS BIGINT) AS cnt
       |FROM ($union) ORDER BY step""".stripMargin
  }

  /** The trainer replay as a bare CTE chain (no WITH, no final select):
    * `wf`/`w0` seed, then per round k the (p_k, m_k, w_k) count/argmax/
    * replace triple — m_k holds round k's learned (x, y). Shared between
    * [[oracleSql]] and the end-to-end [[e2eOracleSql]].
    *
    * Exhaustion is survivable BY CONSTRUCTION: when p_k is empty (the
    * vocabulary ran out of mergeable pairs before round nMerges), m_k
    * emits a sentinel ('0','0', cnt=-1) instead of going empty — '0'
    * cannot appear in any symbol (words are ^[a-z]+$), so the round's
    * replace is a no-op, exactly matching the trainer's early stop.
    * Without the sentinel the w_{k-1} x m_k product emptied the WHOLE
    * chain and every downstream count silently collapsed to 0.
    */
  def oracleCtes(nMerges: Int, maxWords: Int): String = {
    val head =
      s"""wf AS MATERIALIZED (
         |  SELECT w, count(*) AS freq FROM (
         |    SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w
         |    FROM documents) u
         |  WHERE regexp_matches(w, '^[a-z]+$$') AND length(w) >= 2
         |  GROUP BY w ORDER BY freq DESC, w LIMIT $maxWords),
         |w0 AS MATERIALIZED (
         |  SELECT freq, regexp_replace(w, '(.)', ' \\1 ', 'g') AS s FROM wf)""".stripMargin
    val rounds = (1 to nMerges).map { k =>
      val a = k - 1
      s"""p$k AS (
         |  SELECT t.l[t.i + 1] AS x, t.l[t.i + 2] AS y, sum(t.freq) AS cnt
         |  FROM (SELECT freq, l, unnest(range(len(l) - 1)) AS i
         |        FROM (SELECT freq, string_split(trim(s), '  ') AS l
         |              FROM w$a)) t
         |  GROUP BY 1, 2),
         |m$k AS MATERIALIZED (
         |  SELECT * FROM (SELECT $k AS step, x, y, cnt FROM p$k
         |                 ORDER BY cnt DESC, x, y LIMIT 1)
         |  UNION ALL
         |  SELECT $k AS step, '0' AS x, '0' AS y, -1 AS cnt
         |  WHERE NOT EXISTS (SELECT 1 FROM p$k)),
         |w$k AS MATERIALIZED (
         |  SELECT freq,
         |    replace(s, ' ' || m.x || '  ' || m.y || ' ',
         |            ' ' || m.x || m.y || ' ') AS s
         |  FROM w$a, m$k m)""".stripMargin
    }
    s"""$head,
       |${rounds.mkString(",\n")}""".stripMargin
  }

  /** End-to-end oracle: learn the merges table ([[oracleCtes]] — the same
    * unrolled train replay `text_bpe_train` verifies) and TOKENIZE the
    * whole corpus with it, replaying the applier kernel per distinct word.
    *
    * The apply replay uses the trainer's own double-delimiter encoding
    * (' x  y ' → ' xy ', flanking spaces re-emitted), NOT the
    * single-chr(31) scheme of the static-table oracle: a LEARNED table may
    * contain a self-pair rule (x == y), and only the double-delimiter
    * replace is greedy-equivalent for those (the single-delimiter form
    * consumes the shared boundary and converges to a longer tokenization
    * on runs of 6+ identical symbols). One replace per rank is exact here
    * because the kernel itself makes ONE left-to-right non-overlapping
    * pass per rule, and double-delimited matches never share characters.
    */
  def e2eOracleSql(nMerges: Int = 12, maxWords: Int = 2000): String = {
    val applies = (1 to nMerges).map { k =>
      val a = k - 1
      s"""a$k AS MATERIALIZED (
         |  SELECT a$a.w, replace(a$a.s, ' ' || m.x || '  ' || m.y || ' ',
         |                        ' ' || m.x || m.y || ' ') AS s
         |  FROM a$a, m$k m)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${oracleCtes(nMerges, maxWords)},
       |dw AS MATERIALIZED (
       |  SELECT DISTINCT unnest(string_split_regex(trim(text), '\\s+')) AS w
       |  FROM documents WHERE length(trim(text)) > 0),
       |a0 AS MATERIALIZED (
       |  SELECT w, regexp_replace(w, '(.)', ' \\1 ', 'g') AS s FROM dw),
       |$applies,
       |fin AS MATERIALIZED (
       |  SELECT w, CAST(len(string_split(trim(s), '  ')) AS BIGINT) AS n
       |  FROM a$nMerges),
       |wc AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
       |       FROM documents WHERE length(trim(text)) > 0),
       |agg AS (SELECT wc.doc_id, sum(fin.n) AS n_bpe FROM wc JOIN fin USING (w)
       |        GROUP BY 1)
       |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       |  CAST(coalesce(agg.n_bpe, 0) AS BIGINT) AS n_bpe
       |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
       |ORDER BY doc_id""".stripMargin
  }
}
