package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.AtomicLong

/** Scale rehearsal: run the most expensive corpus queries on an
  * sf1-EQUIVALENT corpus (10x the sf0.1 documents/embeddings, synthesized
  * deterministically) and record wall time plus per-task shuffle volume at
  * BOTH scales. The claim under test is the 100 TB story: candidate
  * generation is bounded equi-joins, so shuffle volume must grow ~linearly
  * in the corpus (10x), NOT quadratically in potential pairs (100x), and no
  * single task may blow up (max-task shuffle bytes stays a small multiple
  * of the mean).
  *
  * Synthesis (all distributed, no driver materialization):
  *  - documents (round-13 shingle-preserving scheme; the previous word
  *    permutation manufactured hot shingles on short docs — few distinct
  *    permutations — which maxDf blocking then dropped, silently emptying
  *    the capped query at 100x):
  *     - replica 0 keeps the original text, so the base corpus's natural
  *       duplicate structure survives exactly once;
  *     - replica 1 of every `PlantEvery`-th base doc (with >= 4 distinct
  *       3-gram shingles) is a PLANTED NEAR-DUP: the original text with one
  *       unique salt token appended. It shares every base shingle with its
  *       replica-0 twin (3-gram Jaccard |S|/(|S|+1) >= 0.8 at |S| >= 4) and
  *       those shared shingles appear ONLY in the twin pair (+ any natural
  *       dups), df ~ 2 << maxDf — so the planted pairs SURVIVE rare-shingle
  *       blocking and the capped operator's recall contract is exercised at
  *       tier, not just on spec data;
  *     - every other replica is a NEW document: a salt token drawn from a
  *       ZIPF-ISH PHRASE POOL (log-uniform over [1, 10^4], P(v) ~ 1/v — the
  *       realistic repeated-phrase frequency shape) is spliced after every
  *       2nd word, so every 3-gram window contains a salt and no base
  *       shingle survives into the replica (planted df stays ~2; replicas
  *       never near-dup the base or each other — pair output stays
  *       ~constant while the corpus grows reps x). Hot pool values make
  *       windows COLLIDE across replicas of the same doc (same local words,
  *       same salt draw): those warm/hot shingles generate candidate pairs
  *       quadratic in reps that exact verification kills — the realistic
  *       regime where the exact prefix-filter family goes superlinear while
  *       the df-capped substitute stays bounded by construction.
  *  - embeddings: replica r is the base vector cyclically rotated by r
  *    (distinct direction, same norm; replica 0 = original).
  *
  * Writes bench/scale_rehearsal.json (committed cross-round artifact) and
  * target/scale_rehearsal.json. One-off dev tool: single timed run per
  * (query, scale) after a shared session warmup — the numbers are for
  * scaling RATIOS, not micro-benchmarks (see bench/bench_full.json for
  * those).
  */
object ScaleRehearsal {

  /** Accumulates per-task shuffle metrics between reset() and snapshot.
    * Listener delivery is async; callers sleep briefly before reading.
    */
  private final class ShuffleMeter extends SparkListener {
    val writeTotal = new AtomicLong; val writeMaxTask = new AtomicLong
    val readTotal = new AtomicLong; val readMaxTask = new AtomicLong
    val tasks = new AtomicLong
    def reset(): Unit = Seq(writeTotal, writeMaxTask, readTotal, readMaxTask, tasks)
      .foreach(_.set(0L))
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        val w = m.shuffleWriteMetrics.bytesWritten
        val r = m.shuffleReadMetrics.totalBytesRead
        writeTotal.addAndGet(w); readTotal.addAndGet(r); tasks.incrementAndGet()
        writeMaxTask.updateAndGet(c => math.max(c, w))
        readMaxTask.updateAndGet(c => math.max(c, r))
      }
    }
  }

  /** Plant a near-dup copy (replica 1) for every PlantEvery-th base doc. */
  private[tools] val PlantEvery = 50L

  /** Zipf-ish salt from the log-uniform phrase pool: "z" + floor(M^u) with
    * u uniform in [0,1), M = 10^4 — P(v) ~ 1/(v ln M), the repeated-phrase
    * frequency shape of a real corpus.
    */
  private def zipfSalt(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(lit("z"), floor(pow(lit(10000.0),
      pmod(xxhash64(key), lit(4096)).cast("double") / 4096.0))
      .cast("long").cast("string"))

  /** Planted-near-dup eligibility: >= 4 distinct 3-gram shingles, so the
    * appended-salt copy clears Jaccard |S|/(|S|+1) >= 0.8. Mirrors the
    * tokens/shingle semantics of the dedup operators.
    */
  private def plantable(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    size(graft.functions.VectorFunctions.shingleSet(
      graft.functions.TextFunctions.tokens(text), 3)) >= 4

  /** Count of base docs that will receive a planted near-dup replica —
    * the scaled artifact's expected-recall anchor for the capped query.
    */
  def plantedExpected(spark: SparkSession, srcDir: String): Long =
    spark.read.parquet(s"$srcDir/documents.parquet")
      .filter(pmod(col("doc_id"), lit(PlantEvery)) === 0 &&
        plantable(col("text")))
      .count()

  /** Expected planted-pair count UNDER THE OPERATOR'S RECALL CONTRACT: the
    * capped operator ([[graft.operators.Dedup.ngramJaccardPairsCapped]])
    * emits a pair iff the docs share >= 1 shingle with corpus df <= maxDf —
    * so a planted twin whose base doc's EVERY shingle is hotter than the
    * cap in the SCALED corpus is legitimately blocked (the documented
    * recall boundary, not a regression). Counted on the scaled corpus with
    * the operator's own shingle semantics: plantable replica-0 docs at
    * plant positions having >= 1 shingle with scaled-corpus df <= maxDf.
    */
  def plantedExpectedAtTier(spark: SparkSession, scaledDir: String,
                            reps: Int, maxDf: Long): Long = {
    val docs = spark.read.parquet(s"$scaledDir/documents.parquet")
    val occ = docs
      .select(col("doc_id"), col("text"),
        explode(graft.operators.Dedup.shingleSet(col("text"), 3)).as("g"))
    val rare = occ.groupBy("g").agg(count(lit(1)).as("_df"))
      .filter(col("_df") <= maxDf).select("g")
    occ.filter(pmod(col("doc_id"), lit(reps.toLong)) === 0 &&
        pmod(floor(col("doc_id") / reps), lit(PlantEvery)) === 0 &&
        plantable(col("text")))
      .join(rare, "g")
      .select("doc_id").distinct().count()
  }

  /** 10x the corpus into `outDir` with the same table names Tables expects. */
  def synthesize(spark: SparkSession, srcDir: String, outDir: String,
      reps: Int): Unit = {
    val rep = explode(sequence(lit(0), lit(reps - 1))).as("r")

    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val planted = col("r") === 1 &&
      pmod(col("doc_id"), lit(PlantEvery)) === 0 && plantable(col("text"))
    // unique per (doc, r): the planted copy's one extra shingle matches
    // nothing anywhere else in the corpus
    val plantSalt = substring(md5(concat_ws("", lit("plant"),
      col("doc_id").cast("string"), col("r").cast("string"))), 1, 8)
    // salt after every 2nd word => every 3-gram window contains a salt and
    // no base shingle survives into the replica; the salt VALUE is the
    // Zipf-pool draw keyed on (doc, r, slot), so hot values collide across
    // replicas of the same doc (same surrounding words, same salt) and
    // manufacture the warm-shingle candidate pairs a real corpus has —
    // exact verification kills them, but the exact prefix-filter family
    // pays for them quadratically in reps while the df-capped substitute
    // stays bounded by construction
    val salted = concat_ws(" ", flatten(transform(split(col("text"), " "),
      (w, i) => when(pmod(i, lit(2)) === 1,
          array(w, zipfSalt(concat_ws("", col("doc_id").cast("string"),
            col("r").cast("string"), i.cast("string")))))
        .otherwise(array(w)))))
    docs.select(col("*"), rep)
      .select(
        (col("doc_id") * reps + col("r")).as("doc_id"),
        when(col("r") === 0, col("text"))
          .when(planted, concat(col("text"), lit(" "), plantSalt))
          .otherwise(salted).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    // replica r: (-1)^(r div dim) * rotate(v, r mod dim) — bit-identical
    // to the plain rotation for r < dim (the committed 10x artifact), and
    // collision-free up to r < 2*dim (the 100x tier at dim=64): the sign
    // flip gives each rotation exactly TWO distinct replicas (opposite
    // half-spaces), after which replicas r and r+2*dim repeat
    // bit-identically and would silently seed the fake dup cliques this
    // scheme exists to avoid — so refuse reps past the bound instead of
    // fabricating a misleading tier
    val embDim = emb.select(size(col("embedding"))).head().getInt(0)
    require(reps <= 2 * embDim,
      s"embedding replica scheme (sign x rotation) is collision-free only " +
        s"for reps <= 2*dim = ${2 * embDim}; got $reps — extend the scheme " +
        "with more orthogonal transforms before rehearsing that tier")
    val dim = size(col("embedding"))
    val rot = pmod(col("r"), dim)
    val sgn = when(pmod(expr("r div size(embedding)"), lit(2)) === 1,
      lit(-1.0f)).otherwise(lit(1.0f))
    emb.select(col("*"), rep)
      .select(
        (col("vec_id") * reps + col("r")).as("vec_id"),
        when(col("r") === 0, col("embedding")).otherwise(
          transform(
            concat(
              slice(col("embedding"), rot + 1, dim - rot),
              slice(col("embedding"), lit(1), rot)),
            x => x * sgn)).as("embedding"),
        col("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    // orders/customer replicas back the distributed-quantile rehearsal:
    // custkey' = custkey*reps + r multiplies GROUP CARDINALITY by reps
    // while keeping per-group size constant — exactly the axis the
    // unbounded-group task-table path (lowerQuantilesGroupedDF) exists
    // for. Values ride unperturbed: group keys are distinct, so identical
    // per-replica value sets shortcut nothing in the bisection. Only the
    // columns q_exact_customer_median reads are carried.
    spark.read.parquet(s"$srcDir/orders.parquet")
      .select(col("o_custkey"), col("o_totalprice"), rep)
      .select((col("o_custkey") * reps + col("r")).as("o_custkey"),
        col("o_totalprice"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
    // c_name rides RAW into every replica: match_entities decorates each
    // record with an md5(new-id) suffix before linking, and the new ids are
    // replica-unique — so same-name replicas land >= 2 edits apart and the
    // 3-node entity structure multiplies by reps instead of fusing into
    // cross-replica cliques
    spark.read.parquet(s"$srcDir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_name"), rep)
      .select((col("c_custkey") * reps + col("r")).as("c_custkey"),
        col("c_mktsegment"), col("c_name"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/customer.parquet")
  }

  // the most expensive queries per bench/bench_full.json — the ones whose
  // 100 TB story the rehearsal must back with numbers. Round 7 adds the
  // new cost leader (corpus_split_safe — the full CC pipeline re-keyed as
  // a split), the cell-joined semantic dedupe, and the bounded-offset
  // global ordering. Only documents/embeddings-backed queries qualify:
  // the synthesized dir carries exactly those two tables.
  private val names = Seq("dedup_ngram_jaccard", "dedup_groups",
    "dedup_canonical", "dedup_containment", "ann_lsh_topk",
    "corpus_importance", "corpus_split_safe", "dedup_semantic",
    "corpus_global_order",
    // round 8: the ingest near-dup gate — index build (first touch) + delta
    // sketch + bucketed probe; at 10x the corpus the delta side is what
    // grows, exactly the daily-batch regime the operator exists for
    "dedup_incremental_near",
    // round 9: the real BPE kernel (per-row scan work — must scale flat per
    // row) and the two multimodal near-dup pipelines (codec map stage +
    // pigeonhole banding join — the banding shuffle must stay linear)
    "text_bpe_tokens", "mm_phash_pairs", "mm_audio_fp_pairs",
    // round 10: trainer->applier end to end — the corpus-sized stages are
    // ONE word-frequency agg (train) and one applier scan; the merge
    // rounds iterate on the capped word table, so 10x corpus must cost
    // ~10x the two linear passes and nothing more
    "text_bpe_e2e",
    // round 11: the unbounded-group distributed quantile (orders/customer
    // replicas, 10x GROUP CARDINALITY at constant group size): round count
    // must stay at its value-domain bound (<= 6 at B=4096 — reported as
    // bisect_rounds) and the |tasks|·B histogram shuffle must scale
    // linearly in groups with bounded max-task bytes
    "q_exact_customer_median",
    // round 11: entity resolution over 10x ENTITIES (customer replicas;
    // the md5-suffix decoration keeps replicas >= 2 edits apart, so entity
    // count scales and clique size does not): deletion-neighborhood key
    // join must stay linear in records, CC rounds flat at 3-node cliques
    "match_entities",
    // round 11: the decontamination pair — broadcast eval grams vs bloom
    // prefilter + shuffled verify; the bloom variant must stay linear in
    // the corpus with the filter scalar its only broadcast
    "text_decontaminate",
    "corpus_decontaminate_bloom",
    // round 12: the near-dup SCALE story's missing measurements — the exact
    // prefix-filter pair family blew up at 100x (522x/197x), and these are
    // its designed substitutes: banded LSH candidates, the incremental
    // bucketed index probe, and the df-capped rare-shingle blocking whose
    // candidate volume is <= maxDf * |occurrences| by construction. Their
    // curves must stay near-linear at the tier where exact explodes.
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard_capped",
    // round 12: the canonical-map maintenance step — its cost must track
    // (new pairs + touched components), not the historical graph, so the
    // ratio at 10x deltas is the whole claim
    "dedup_incremental_groups",
    // round 13: the full SUBSTITUTE near-dup pipeline end to end — df-capped
    // pair generation -> CC canonical map — so the tier story has a complete
    // bounded-cost path (pairs AND groups), complementing the incremental
    // map-maintenance number
    "dedup_groups_capped",
    // round 15: the tier path users actually run for splits — the
    // leakage-safe split keyed on the PERSISTED capped canonical map. Its
    // warmup pays the build-once cost (capped pairs + CC + bucketed write,
    // measured inline by dedup_groups_capped above); the timed run is what
    // every later consumer pays per query — the build-once/query-many
    // amortization claim, measured at both scales
    "corpus_split_safe_capped",
    // round 15: the raw persisted-map read (table == inline recompute is
    // oracle-pinned at sf0.01/sf0.1) — consumer cost with zero map-side
    // Exchange, beside the inline recompute's curve
    "dedup_canonical_map")

  /** cumulative hypervisor steal seconds from /proc/stat (field 8), -1 if
    * unreadable — per-query deltas attribute host bursts to the exact
    * timed window they landed in, mirroring Bench's per-query steal
    * attribution so tier artifacts carry the same canonicality signal.
    */
  private def stealTickSec(): Double =
    try {
      val line = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get("/proc/stat")).get(0)
      line.trim.split("\\s+").drop(1).lift(7)
        .map(_.toLong / 100.0).getOrElse(-1.0)
    } catch { case _: Throwable => -1.0 }

  private def fmt(n: String, sec: Double, rows: Long, m: ShuffleMeter,
                  extra: String = ""): String =
    s""""$n":{"sec":${math.round(sec * 1000) / 1000.0},"rows":$rows,""" +
      s""""shuffle_write_bytes":${m.writeTotal.get},""" +
      s""""shuffle_write_max_task":${m.writeMaxTask.get},""" +
      s""""shuffle_read_bytes":${m.readTotal.get},""" +
      s""""shuffle_read_max_task":${m.readMaxTask.get},""" +
      s""""tasks":${m.tasks.get}$extra}"""

  def main(args: Array[String]): Unit = {
    val base = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft-sf1equiv"
    // args(2): replication factor (default 10 — the committed artifact);
    // args(3): optional comma-separated query subset, for the 100x tier
    // where the full list would run for hours
    val reps = if (args.length > 2) args(2).toInt else 10
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").map(_.trim).toSet)
      else None
    val spark = graft.GraftSession.tune(SparkSession.builder()
        .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
        .config("spark.sql.shuffle.partitions",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // experiment passthrough: SPARK_GRAFT_LOCAL_CKPT_LEVEL=MEMORY_AND_DISK_SER
    // flips Lineage.cut's block storage for A/B runs at the 100x tier
    sys.env.get("SPARK_GRAFT_LOCAL_CKPT_LEVEL")
      .foreach(l => spark.conf.set(graft.operators.Lineage.LevelConf, l))
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    System.err.println(s"[rehearsal] synthesizing ${reps}x corpus -> $out")
    synthesize(spark, base, out, reps)

    // one shared warmup (codegen + scan paths) so neither scale pays JIT
    graft.SparkEntry.queries("dedup_ngram_jaccard")(spark, base)
      .write.format("noop").mode("overwrite").save()

    val picked = only.fold(names)(f => names.filter(f.contains))
    def timed(dir: String): Seq[String] = picked.map { n =>
      try {
        // warmup on a THROWAWAY instance: the dedup operators localCheckpoint
        // intermediate sets/edges per Dataset instance, so timing a previously
        // count()ed instance would reuse its materialized checkpoints and
        // under-report both time and shuffle
        val rows = graft.SparkEntry.queries(n)(spark, dir).count()
        Thread.sleep(1500) // drain the warmup's listener events out of the window
        meter.reset()
        val st0 = stealTickSec()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        val qSteal = { val st1 = stealTickSec()
          if (st0 >= 0 && st1 >= 0) math.round((st1 - st0) * 100) / 100.0
          else -1.0 }
        Thread.sleep(1500) // listener bus drain
        // the quantile rehearsal's round-count claim, from the operator's
        // own probe (set by the timed run just above)
        val extra = (if (n == "q_exact_customer_median")
          s""","bisect_rounds":${graft.operators.ExactQuantiles.lastRounds}"""
        else "") + s""","steal_sec":$qSteal"""
        System.err.println(f"[rehearsal] $dir $n: $sec%.1fs, $rows rows, " +
          s"maxTaskShufW=${meter.writeMaxTask.get}$extra")
        fmt(n, sec, rows, meter, extra)
      } catch { case e: Throwable =>
        // one broken query must not lose the whole artifact (round-7
        // lesson: a missing table aborted the run before any JSON landed)
        System.err.println(s"[rehearsal] $dir $n FAILED: ${e.getMessage}")
        s""""$n":{"error":"${e.getClass.getSimpleName}"}"""
      } finally {
        // per-query teardown (Bench's round-8 lesson, learned here the hard
        // way in round 14): without it the run accumulates cached frames +
        // lazy-localCheckpoint blocks across every (query, scale) pair, and
        // a single-JVM 100x run degrades until even broadcast builds that
        // fit comfortably at query #1 OOM at query #15 (measured: the
        // capped query ran 4.8 s at base early in the run, then failed
        // "not enough memory to broadcast" at the tier late in it)
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }

    // host-state bracketing (VERDICT r16 task 4): the same under-load
    // steal spin + fsync'd IO probes Bench runs, at run start / between
    // tiers / at run end — a reader of a tier regression can now tell a
    // real curve change from a measured host burst without cross-checking
    // wall-clock against campaign logs
    def probePair(): (Double, Double) =
      (graft.Bench.stealProbePct(), graft.Bench.ioProbe())
    val (stealStart, ioStart) = probePair()
    System.err.println(
      f"[rehearsal] probes start: steal=$stealStart%.2f%% io=$ioStart%.2fs")
    val baseJson = timed(base).mkString("{", ",", "}")
    val (stealMid, ioMid) = probePair()
    System.err.println(
      f"[rehearsal] probes mid: steal=$stealMid%.2f%% io=$ioMid%.2fs")
    val bigJson = timed(out).mkString("{", ",", "}")
    // planted-near-dup recall at tier (VERDICT r12 #3): the synthesis
    // plants one appended-salt near-dup per PlantEvery-th base doc, so the
    // capped query's scaled output must CONTAIN those pairs — ids
    // (d*reps, d*reps+1) with d % PlantEvery == 0. found < expected means
    // blocking dropped a planted pair (a recall regression at tier). The
    // expected count honors the operator's df-cap recall contract
    // (plantedExpectedAtTier); replica 1 only exists at reps >= 2, so the
    // check is skipped below that (a reps=1 smoke run would otherwise
    // report a spurious expected>0/found=0 regression).
    val plantedJson =
      if (reps >= 2 && picked.contains("dedup_ngram_jaccard_capped")) {
        try {
          // 20L mirrors the dedup_ngram_jaccard_capped query's maxDf pin
          val expected = plantedExpectedAtTier(spark, out, reps, maxDf = 20L)
          val found = graft.SparkEntry.queries("dedup_ngram_jaccard_capped")(spark, out)
            .filter(col("doc_b") === col("doc_a") + 1 &&
              pmod(col("doc_a"), lit(reps.toLong)) === 0 &&
              pmod(floor(col("doc_a") / reps), lit(PlantEvery)) === 0)
            .count()
          System.err.println(
            s"[rehearsal] planted near-dups: expected=$expected found=$found")
          s""""planted_near_dups_expected":$expected,""" +
            s""""planted_near_dups_found":$found,"""
        } catch { case e: Throwable =>
          // the recall anchor must not lose the artifact either (it aborted
          // the whole round-14 first attempt after a late-run OOM)
          System.err.println(s"[rehearsal] planted check FAILED: ${e.getMessage}")
          s""""planted_check_error":"${e.getClass.getSimpleName}","""
        }
      } else ""
    // round 16: the persisted-map FOLD at tier — the claim under test is
    // that canonical-map maintenance cost tracks the DELTA (touched
    // components to compute, touched pbucket partitions to rewrite), never
    // the map: build the capped-family map at the scaled tier ONCE (the
    // contrast number — this is what a consumer-triggered recompute would
    // pay), fold an epoch-shaped delta (a few new docs joining existing
    // components), and count the partitions whose files actually changed.
    // An honest fold artifact needs all four numbers side by side:
    // build_sec >> fold_sec, touched_partitions << total_partitions,
    // and the replayed fold (idempotence) rewriting nothing.
    val foldJson = if (picked.contains("dedup_canonical_map")) {
      try {
        import graft.operators.Dedup
        val tbl = "rehearsal_cmap"
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
        val docs = spark.read.parquet(s"$out/documents.parquet")
        val sb0 = stealTickSec()
        val tb0 = System.nanoTime()
        Dedup.buildCanonicalMap(
          Dedup.ngramJaccardPairsCapped(docs, "doc_id", "text", 3, 0.8,
            maxDf = 20L),
          "doc_a", "doc_b", tbl, nPartitions = 64)
        val buildSec = (System.nanoTime() - tb0) / 1e9
        val buildSteal = { val s1 = stealTickSec()
          if (sb0 >= 0 && s1 >= 0) math.round((s1 - sb0) * 100) / 100.0
          else -1.0 }
        val mapRows = spark.table(tbl).count()
        def inv(): Map[String, (Long, Long)] = {
          val loc = new java.net.URI(spark.sql(s"DESCRIBE EXTENDED $tbl")
            .where(col("col_name") === "Location")
            .select("data_type").collect()(0).getString(0)).getPath
          def walk(f: java.io.File): Seq[java.io.File] =
            if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
            else Seq(f)
          walk(new java.io.File(loc)).filter(_.getName.endsWith(".parquet"))
            .map(f => f.getAbsolutePath -> (f.length(), f.lastModified()))
            .toMap
        }
        def pbuckets(files: Iterable[String]): Set[String] =
          files.flatMap("pbucket=\\d+".r.findFirstIn(_)).toSet
        val before = inv()
        // epoch-shaped delta: 10 fresh docs, each joining one existing
        // component (ids above the corpus range so the canonical minima —
        // and therefore every EXISTING row — stay put: changed rows are
        // exactly the 10 new docs)
        val members = spark.table(tbl).select(col("doc_id"))
          .orderBy(col("doc_id")).limit(10).collect().map(_.getLong(0))
        val maxId = spark.table(tbl).agg(max(col("doc_id")))
          .collect()(0).getLong(0)
        import spark.implicits._
        val delta = members.zipWithIndex
          .map { case (m, i) => (m, maxId + i + 1) }.toSeq
          .toDF("doc_a", "doc_b")
        val sf0 = stealTickSec()
        val tf0 = System.nanoTime()
        Dedup.foldIntoCanonicalMap(tbl, delta, "doc_a", "doc_b")
        val foldSec = (System.nanoTime() - tf0) / 1e9
        val foldSteal = { val s1 = stealTickSec()
          if (sf0 >= 0 && s1 >= 0) math.round((s1 - sf0) * 100) / 100.0
          else -1.0 }
        val after = inv()
        val changedFiles = after.keySet.filter(p =>
          !before.get(p).contains(after(p))) ++ (before.keySet -- after.keySet)
        val touched = pbuckets(changedFiles)
        val total = pbuckets(after.keys)
        val tn0 = System.nanoTime()
        Dedup.foldIntoCanonicalMap(tbl, delta, "doc_a", "doc_b")
        val noopSec = (System.nanoTime() - tn0) / 1e9
        val after2 = inv()
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
        System.err.println(s"[rehearsal] cmap fold: build=$buildSec " +
          s"fold=$foldSec touched=${touched.size}/${total.size} noop=$noopSec")
        s""""cmap_fold":{"build_sec":${math.round(buildSec * 1000) / 1000.0},""" +
          s""""build_steal_sec":$buildSteal,""" +
          s""""map_rows":$mapRows,"delta_pairs":${members.length},""" +
          s""""fold_sec":${math.round(foldSec * 1000) / 1000.0},""" +
          s""""fold_steal_sec":$foldSteal,""" +
          s""""touched_partitions":${touched.size},""" +
          s""""total_partitions":${total.size},""" +
          s""""refold_noop_sec":${math.round(noopSec * 1000) / 1000.0},""" +
          s""""refold_rewrote_files":${after2 != after}},"""
      } catch { case e: Throwable =>
        System.err.println(s"[rehearsal] cmap fold FAILED: ${e.getMessage}")
        s""""cmap_fold":{"error":"${e.getClass.getSimpleName}"},"""
      }
    } else ""
    val (stealEnd, ioEnd) = probePair()
    System.err.println(
      f"[rehearsal] probes end: steal=$stealEnd%.2f%% io=$ioEnd%.2fs")
    def r2(x: Double) = math.round(x * 100) / 100.0
    val probesJson =
      s""""probes":{"steal_pct_start":${r2(stealStart)},""" +
        s""""steal_pct_mid":${r2(stealMid)},""" +
        s""""steal_pct_end":${r2(stealEnd)},""" +
        s""""io_sec_start":${r2(ioStart)},"io_sec_mid":${r2(ioMid)},""" +
        s""""io_sec_end":${r2(ioEnd)}},"""
    val level = sys.env.get("SPARK_GRAFT_LOCAL_CKPT_LEVEL")
      .map(l => s""""local_ckpt_level":"$l",""").getOrElse("")
    val json =
      s"""{"base_sf":"$base","scaled_reps":$reps,$probesJson$level""" +
        s"""$plantedJson$foldJson""" +
        s""""base":$baseJson,"scaled":$bigJson}""" + "\n"
    // the default 10x run owns the canonical artifact name; other tiers
    // (e.g. the 100x decade) land beside it, never over it
    val artifact =
      if (reps == 10) "scale_rehearsal.json" else s"scale_rehearsal_${reps}x.json"
    for (d <- Seq("target", "bench")) {
      val dir = java.nio.file.Paths.get(d)
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.writeString(dir.resolve(artifact), json)
    }
    try spark.stop() catch { case _: Throwable => () }
    println(json)
  }
}
