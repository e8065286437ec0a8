package graft.operators

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}

/** Frequency sketching over high-cardinality token streams — the two
  * classic mergeable summaries a 100 TB corpus profile needs when the
  * distinct-key universe is too large to shuffle wholesale:
  *
  *   - Count-Min (Cormode & Muthukrishnan 2005): a depth×width table of
  *     counts; point estimate = min over rows. Never underestimates;
  *     overestimate ≤ N/width per row w.h.p. Build is ONE pass with
  *     map-side partial aggregation onto a bounded key space
  *     (depth·width rows), so the shuffle is O(depth·width) regardless
  *     of corpus size or vocabulary.
  *   - Misra-Gries / batched space-saving (Misra & Gries 1982; merge rule
  *     per Agarwal et al., "Mergeable Summaries", PODS 2012): ≤k
  *     (token, count) entries with underestimate error ≤ N/(k+1) under
  *     ANY merge tree — which is exactly what a partition-parallel
  *     `Aggregator` needs. Used here as a CANDIDATE generator: the
  *     guarantee makes the sketch a superset of every token with true
  *     count > N/(k+1), so a second exact counting pass restricted to the
  *     candidates (broadcast semi-join, map-side pruned) returns the
  *     EXACT heavy-hitter set — sketch speed, zero approximation in the
  *     output, and a plain SQL `HAVING count(*) >= t` oracle can verify
  *     it.
  *
  * Scale argument vs a plain `groupBy(token).count()`: with V distinct
  * tokens (billions for web-scale n-grams) the plain plan shuffles V
  * keys. The sketch plans shuffle O(depth·width) (CMS) or O(partitions·k)
  * (MG partials) plus, for the exact confirm, only the candidate keys —
  * wins whenever V ≫ partitions·k, the normal regime for n-gram vocab at
  * 100 TB. Sketch size scales as N/minCount (more total mass at the same
  * absolute threshold needs a bigger summary); at scale the threshold is
  * proportionally larger, keeping k bounded.
  *
  * Hashing uses the md5-derived 60-bit family (same convention as every
  * dedup/ANN oracle in this repo — `CorpusOps.gramBucket`) so a DuckDB
  * oracle can replay the CMS table cell-for-cell with integer-exact math.
  */
object FreqSketch {

  /** CMS row-d bucket for a token: 60-bit md5 hash of `"cms<d>|tok"` mod
    * width. Depth is baked into the hashed string, giving `depth`
    * pairwise-independent-enough rows from one md5 family.
    */
  def cmsBucket(tok: Column, depth: Int, width: Int): Column =
    pmod(conv(substring(md5(concat_ws("|", lit("cms" + depth), tok)), 1, 15),
      16, 10).cast("long"), lit(width.toLong))

  private def bucketRows(df: DataFrame, tokCol: String, depth: Int,
                         width: Int, keep: Column*): DataFrame =
    df.select(keep :+ posexplode(array((0 until depth).map(d =>
      cmsBucket(col(tokCol), d, width)): _*)).as(Seq("depth", "bucket")): _*)

  /** Build the Count-Min table: one row per (depth, bucket) with the
    * summed occurrence count — `depth×width` rows total, so the aggregate
    * is map-side-combined onto a bounded key space and the result is
    * broadcastable however large the corpus.
    */
  def countMinTable(tokens: DataFrame, tokCol: String, depth: Int,
                    width: Int): DataFrame =
    bucketRows(tokens, tokCol, depth, width)
      .groupBy(col("depth"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-frequency estimates for a probe set: hash each probe into its
    * `depth` buckets, join the (broadcast) CMS table, take the min across
    * rows. `est_count >= true count` always (CMS never undercounts).
    */
  def cmsEstimate(table: DataFrame, probes: DataFrame, tokCol: String,
                  depth: Int, width: Int): DataFrame =
    bucketRows(probes, tokCol, depth, width, col(tokCol))
      .join(broadcast(table), Seq("depth", "bucket"))
      .groupBy(col(tokCol))
      .agg(min(col("cnt")).as("est_count"))

  /** MG summary: ≤cap (token, undercount) entries. A Map survives the
    * product encoder and keeps reduce O(1) per element.
    */
  case class MgBuf(entries: Map[String, Long])

  /** Mergeable Misra-Gries. `k` sets the error bound (≤ N/(k+1)); `cap`
    * is the working size — inserts are O(1) until the buffer hits cap,
    * then one O(cap) batched decrement (subtract the (k+1)-th largest
    * count, drop non-positives) prunes back to ≤k entries, amortizing to
    * O(1) per token. The same prune is the PODS'12 merge rule, so any
    * partition/merge order yields the N/(k+1) guarantee.
    */
  class MisraGries(k: Int, cap: Int) extends Aggregator[String, MgBuf, MgBuf] {
    require(k > 0 && cap > k, s"need cap > k > 0, got k=$k cap=$cap")

    private def prune(m: Map[String, Long]): Map[String, Long] =
      if (m.size <= k) m
      else {
        // (k+1)-th largest count; strictly-greater survivors number ≤ k
        val arr = m.valuesIterator.toArray
        java.util.Arrays.sort(arr)
        val kth = arr(arr.length - 1 - k)
        m.collect { case (t, c) if c > kth => t -> (c - kth) }
      }

    override def zero: MgBuf = MgBuf(Map.empty)
    override def reduce(b: MgBuf, tok: String): MgBuf = {
      val m = b.entries.updatedWith(tok)(c => Some(c.getOrElse(0L) + 1L))
      MgBuf(if (m.size > cap) prune(m) else m)
    }
    override def merge(a: MgBuf, b: MgBuf): MgBuf = {
      val (small, big) = if (a.entries.size < b.entries.size)
        (a.entries, b.entries) else (b.entries, a.entries)
      MgBuf(prune(small.foldLeft(big) { case (m, (t, c)) =>
        m.updatedWith(t)(c0 => Some(c0.getOrElse(0L) + c)) }))
    }
    override def finish(b: MgBuf): MgBuf = MgBuf(prune(b.entries))
    override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
    override def outputEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
  }

  /** EXACT heavy hitters via sketch-then-confirm: (1) one count action for
    * N, (2) one MG pass sized so the sketch provably contains every token
    * with count ≥ minCount (k+1 > N/minCount ⇒ error < minCount), (3) one
    * exact counting pass over just the ≤k candidates (broadcast semi-join
    * prunes every non-candidate map-side; only candidate keys shuffle).
    * Output: (tokCol, cnt) for every token with true count ≥ minCount —
    * exact, so a plain GROUP BY / HAVING oracle verifies it.
    */
  def heavyHitters(tokens: DataFrame, tokCol: String, minCount: Long): DataFrame = {
    require(minCount > 0, s"minCount must be positive, got $minCount")
    val spark = tokens.sparkSession
    import spark.implicits._
    val toks = tokens.select(col(tokCol).cast("string")).na.drop().as[String]
    val n = toks.count()
    // error ≤ N/(k+1) < minCount ⟺ k+1 > N/minCount; ×2 for slack
    val k = math.max(63L, 2L * n / minCount + 1L)
      .min(Int.MaxValue / 4L).toInt
    val cands = toks.select(new MisraGries(k, 2 * k).toColumn)
      .head().entries.keys.toSeq
    val candDf = spark.createDataset(cands).toDF(tokCol)
    tokens.join(broadcast(candDf), tokCol)
      .groupBy(col(tokCol)).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }
}
