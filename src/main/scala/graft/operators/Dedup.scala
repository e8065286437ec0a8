package graft.operators

import graft.functions.{TextFunctions, VectorFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication operators for training-data pipelines, each designed
  * for the 100 TB shape: no pairwise O(n²) over the full corpus — candidates
  * come from an equi-join key (content hash, LSH band, simhash block, shared
  * shingle), so Spark executes them as shuffled hash joins on bounded buckets.
  */
object Dedup {

  /** Word n-gram shingles of a text column (n consecutive tokens joined). */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextFunctions.tokens(text)
    when(size(toks) < n, array(array_join(toks, " ")))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
  }

  /** Exact dedupe: group by content hash (md5 here; xxhash64 is cheaper but
    * md5 keeps oracle parity), canonical = min id. Pure hash aggregate with
    * map-side partial combine — the cheapest possible full-corpus dedupe.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Exact n-gram Jaccard near-dup pairs. Candidates = pairs sharing at least
    * one distinct shingle (equi-join on shingle). |∩| from the join group
    * count; |∪| from per-doc shingle counts. Integer arithmetic until the
    * final ratio → deterministic across engines.
    *
    * Scale: the shingle join's fan-out is Σ c_s² over shingle frequencies; a
    * stopword-like shingle would explode it, so extremely frequent shingles
    * (df > maxShingleFreq) are dropped from CANDIDATE GENERATION only — they
    * still count in |∪| via the per-doc totals, keeping jaccard a lower bound
    * that is exact whenever at least one non-stop shingle is shared.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double,
                        maxShingleFreq: Long = 1000000L): DataFrame = {
    val sh = docs
      .select(col(idCol).as("doc"), explode(array_distinct(shingles(col(textCol), n))).as("sh"))
    val counts = sh.groupBy("doc").agg(count(lit(1)).as("n_sh"))
    val filtered = sh.join(
      sh.groupBy("sh").agg(count(lit(1)).as("df")).filter(col("df") <= maxShingleFreq)
        .select("sh"), Seq("sh"))
    val inter = filtered.as("a").join(filtered.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(counts.withColumnRenamed("doc", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(counts.withColumnRenamed("doc", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** MinHash + LSH near-dup pairs: k-permutation signature per doc, banded
    * into `bands` groups of k/bands rows; docs colliding on any (band, band
    * signature) become candidates; candidates verified with exact jaccard.
    *
    * Scale: signature computation is a map-only pass; the LSH join shuffles
    * only (band, hash, doc) tuples — 16 longs per doc instead of the document
    * text. Verification re-joins texts only for the (rare) candidate pairs.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      n: Int, k: Int, bands: Int, threshold: Double,
                      seed: Long = 42L): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rows = k / bands
    val sigs = docs.select(col(idCol).as("doc"), col(textCol).as("text"),
      VectorFunctions.minhashSig(shingles(col(textCol), n), k, seed).as("sig"))
    // bands is a compile-time constant → unroll statically (stays codegen'd,
    // no higher-order-function overhead on the hot path)
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(slice(col("sig"), b * rows + 1, rows)).as("bhash"))
    }
    val banded = sigs.select(col("doc"), col("text"),
        explode(array(bandStructs: _*)).as("lsh"))
      .select(col("doc"), col("text"), col("lsh.band"), col("lsh.bhash"))
    val cands = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bhash") === col("b.bhash") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("a.text").as("text_a"),
        col("b.doc").as("doc_b"), col("b.text").as("text_b"))
      .distinct()
    // exact-jaccard verification of the candidate set
    val verify = cands.withColumn("sa", array_distinct(shingles(col("text_a"), n)))
      .withColumn("sb", array_distinct(shingles(col("text_b"), n)))
      .withColumn("jaccard",
        size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb"))).cast("double"))
    verify.filter(col("jaccard") >= threshold).select("doc_a", "doc_b", "jaccard")
  }

  /** SimHash near-dup pairs at hamming distance ≤ maxDist. Pigeonhole
    * blocking: split the 64-bit fingerprint into maxDist+1 blocks; any pair
    * within distance must agree on ≥1 whole block, so candidates come from an
    * equi-join on (block_no, block_bits) and are verified with bit_count(xor).
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxDist: Int, seed: Long = 42L): DataFrame = {
    val nBlocks = maxDist + 1
    val width = 64 / nBlocks
    val fp = docs.select(col(idCol).as("doc"),
      VectorFunctions.simhash(TextFunctions.tokens(col(textCol)), seed).as("fp"))
    val blockStructs = (0 until nBlocks).map { b =>
      struct(lit(b).as("blk"),
        shiftright(col("fp"), b * width)
          .bitwiseAND(lit((1L << width) - 1)).as("bits"))
    }
    val blocked = fp.select(col("doc"), col("fp"),
        explode(array(blockStructs: _*)).as("p"))
      .select(col("doc"), col("fp"), col("p.blk"), col("p.bits"))
    blocked.as("a").join(blocked.as("b"),
        col("a.blk") === col("b.blk") && col("a.bits") === col("b.bits") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** Embedding near-dup pairs: random-hyperplane LSH bucket join + exact
    * cosine verification with the codegen'd [[VectorFunctions.cosine]].
    * Hyperplane projections use deterministic pseudo-random planes derived
    * from xxhash64(bucket-plane index, dimension) — no driver-side RNG state.
    */
  def embeddingPairs(vecs: DataFrame, idCol: String, vecCol: String,
                     planes: Int, threshold: Double, seed: Long = 42L): DataFrame = {
    val b = vecs.select(col(idCol).as("vid"), col(vecCol).as("v"),
      VectorFunctions.hyperplaneSketch(col(vecCol), planes, seed).as("bucket"))
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("id_a"), col("b.vid").as("id_b"),
        VectorFunctions.cosine(col("a.v"), col("b.v")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
