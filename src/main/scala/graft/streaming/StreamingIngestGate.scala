package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming near-duplicate ingest gate — the ingestion-time loop of the
  * persisted-MinHash family ([[graft.operators.Dedup.buildMinhashIndex]] /
  * [[graft.operators.Dedup.incrementalNearDupPairs]] /
  * [[graft.operators.Dedup.insertMinhashIndex]]) wired into Structured
  * Streaming: every micro-batch of incoming documents probes the banding
  * index in place, near-duplicates of the ACCUMULATED ACCEPTED CORPUS are
  * rejected, and the surviving docs fold into both the corpus table and
  * the index — so the next epoch's batch collides with this epoch's
  * acceptances. This is the daily 100 TB ingest loop running continuously:
  * only each delta pays a sketch pass, the index join stays Exchange-free
  * on the bucketed (band, bhash) layout across any number of epochs
  * (Spark honors the bucket spec on every append).
  *
  * Epoch semantics:
  *   - the FIRST epoch founds the corpus: its docs are accepted wholesale
  *     and indexed (the [[Dedup.buildMinhashIndex]] contract — dedupe
  *     within the founding corpus is the batch operators' job);
  *   - every later epoch rejects docs whose exact Jaccard against ANY
  *     indexed doc reaches `threshold`; intra-batch duplicates (two new
  *     docs duplicating each other, neither indexed) pass the gate — the
  *     contract is new-vs-corpus, compose [[Dedup.minhashLshPairs]]
  *     upstream if intra-batch dedupe is needed.
  *
  * Replay: foreachBatch is at-least-once. A RE-DELIVERED epoch is
  * corpus-idempotent BY CONSTRUCTION: its docs are already indexed, so
  * each re-probed doc exact-matches itself (jaccard 1 ≥ threshold) and is
  * rejected — nothing double-inserts. The narrow caveat is a crash BETWEEN
  * the index append and the corpus append: the replayed doc is then
  * index-rejected and the corpus row is never written; recover by
  * rebuilding the corpus table from the index's doc ids.
  */
object StreamingIngestGate {

  /** Per-epoch gate body (also callable on plain batches — the streaming
    * run and a manual batch-by-batch replay produce identical state, which
    * is the spec's equivalence law). Persists into `corpusTable` +
    * `indexTable` and returns the accepted (id, text) slice.
    */
  def gateBatch(batch: DataFrame, idCol: String, textCol: String,
                corpusTable: String, indexTable: String,
                n: Int, k: Int, bands: Int, threshold: Double,
                seed: Long = 42L, nBuckets: Int = 8): DataFrame = {
    val spark = batch.sparkSession
    val slim = batch.select(col(idCol), col(textCol))
    val accepted =
      if (!spark.catalog.tableExists(indexTable)) {
        Dedup.buildMinhashIndex(slim, idCol, textCol, indexTable,
          n, k, bands, seed = seed, nBuckets = nBuckets)
        slim
      } else {
        // defensive metadata refresh: micro-batches run in a long-lived
        // cloned session, and a cached file listing taken when an earlier
        // epoch first touched the tables would silently hide that epoch's
        // appends from this probe. One catalog round-trip per epoch.
        spark.catalog.refreshTable(indexTable)
        spark.catalog.refreshTable(corpusTable)
        val dupIds = Dedup.incrementalNearDupPairs(slim,
            spark.table(corpusTable), idCol, textCol, indexTable,
            n, k, bands, threshold, seed = seed)
          .select(col("doc_b").as(idCol)).distinct()
        // EAGER lineage cut, not just cache: the accepted frame's lazy plan
        // reads the PRE-insert index state, and a cache is a hint, not a
        // pin — if blocks are evicted or an executor is lost between the
        // index append below and the corpus append, a recompute would
        // observe the post-insert index, self-match every accepted doc
        // (jaccard 1), and silently write an empty corpus slice while the
        // docs stay indexed: permanent corpus/index divergence. The cut
        // materializes the accepted rows NOW, so no later action can
        // re-execute the anti-join against mutated state.
        val acc = graft.operators.Lineage.cut(
          slim.join(dupIds, Seq(idCol), "left_anti"), eager = true)
        // NAMED nBuckets: the positional slot after `bands` is the SEED —
        // passing nBuckets there silently bands the insert under a
        // different hash family than the build/probe (epoch appends become
        // invisible to every later probe; found the hard way)
        Dedup.insertMinhashIndex(acc, idCol, textCol, indexTable,
          n, k, bands, seed = seed, nBuckets = nBuckets)
        acc
      }
    accepted.write.mode(org.apache.spark.sql.SaveMode.Append)
      .format("parquet").saveAsTable(corpusTable)
    accepted
    // NOTE: the returned frame is an eager localCheckpoint (founding epoch
    // aside) — its blocks are freed by the ContextCleaner once the caller
    // drops the reference; the caller-side unpersist is a harmless no-op
    // kept for the plain-cache case.
  }

  /** Start the gate over a streaming document source. `onBatch` observes
    * each epoch's accepted slice (side outputs, metrics); the persisted
    * corpus/index state is the primary output.
    */
  def start(docs: DataFrame, idCol: String, textCol: String,
            corpusTable: String, indexTable: String,
            n: Int, k: Int, bands: Int, threshold: Double,
            checkpointDir: String, seed: Long = 42L, nBuckets: Int = 8)
           (onBatch: (DataFrame, Long) => Unit = (_, _) => ()): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        val accepted = gateBatch(batch, idCol, textCol, corpusTable,
          indexTable, n, k, bands, threshold, seed, nBuckets)
        try onBatch(accepted, epoch)
        finally accepted.unpersist(blocking = false)
      }
      .start()

  /** The FULL daily-ingest loop body: [[gateBatch]] (reject near-dups of
    * the corpus at `gateThreshold`, persist corpus + index), then maintain
    * the PERSISTED CANONICAL MAP over the survivors at `mapThreshold` —
    * the same (doc_id → canonical_id) table the batch consumers
    * (leakage-safe split, representative selection, dedup stats) read. The
    * three persisted-state pieces of the 100 TB pipeline — minhash index,
    * accepted corpus, canonical map — stay in lockstep inside one epoch
    * body, each paying delta-proportional cost: the delta's sketch pass
    * (gate), one index probe at the map threshold, one
    * [[graft.operators.Dedup.foldIntoCanonicalMap]] partition-scoped fold.
    *
    * Thresholds: `gateThreshold` REJECTS (hard dups never enter the
    * corpus); `mapThreshold` (≤ gate, typically looser) GROUPS the
    * survivors for split-safety/dedup-stats questions. The accepted slice
    * is already indexed when the map probe runs, so one probe surfaces
    * cross-epoch AND intra-epoch pairs (self-matches filtered on id).
    *
    * Exactness law (spec-pinned, the stream == batch convention): after
    * any number of epochs, the map table equals `duplicateGroups` over
    * `minhashLshPairs(acceptedCorpus, mapThreshold)` — the full-corpus
    * batch recompute. Holds exactly because both sides band with the same
    * (n, k, bands, seed) family and band collisions are deterministic
    * per-pair, so the union of per-epoch probe pairs is the full-corpus
    * pair set (modulo direction, which CC ignores).
    *
    * Replay: a re-delivered epoch gate-rejects all its docs (exact
    * self-match), yielding zero pairs — the fold is a no-op and the map
    * stays consistent. The narrow crash window between the corpus append
    * and the fold mirrors [[gateBatch]]'s index/corpus caveat: recover by
    * refolding the affected epoch's pairs (the fold is idempotent).
    */
  def gateAndFoldBatch(batch: DataFrame, idCol: String, textCol: String,
                       corpusTable: String, indexTable: String,
                       mapTable: String, n: Int, k: Int, bands: Int,
                       gateThreshold: Double, mapThreshold: Double,
                       seed: Long = 42L, nBuckets: Int = 8): DataFrame = {
    val spark = batch.sparkSession
    val accepted = gateBatch(batch, idCol, textCol, corpusTable, indexTable,
      n, k, bands, gateThreshold, seed, nBuckets)
    val pairs = Dedup.incrementalNearDupPairs(accepted,
        spark.table(corpusTable), idCol, textCol, indexTable,
        n, k, bands, mapThreshold, seed = seed)
      .where(col("doc_a") =!= col("doc_b"))
      .select("doc_a", "doc_b")
    if (!spark.catalog.tableExists(mapTable))
      Dedup.buildCanonicalMap(pairs, "doc_a", "doc_b", mapTable,
        nBuckets = nBuckets)
    else
      Dedup.foldIntoCanonicalMap(mapTable, pairs, "doc_a", "doc_b")
    accepted
  }

  /** [[start]] with the canonical-map fold composed into every epoch —
    * the streaming plane maintaining the same persisted map the batch
    * consumers read.
    */
  def startWithCanonicalMap(docs: DataFrame, idCol: String, textCol: String,
                            corpusTable: String, indexTable: String,
                            mapTable: String, n: Int, k: Int, bands: Int,
                            gateThreshold: Double, mapThreshold: Double,
                            checkpointDir: String, seed: Long = 42L,
                            nBuckets: Int = 8)
                           (onBatch: (DataFrame, Long) => Unit =
                              (_, _) => ()): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        val accepted = gateAndFoldBatch(batch, idCol, textCol, corpusTable,
          indexTable, mapTable, n, k, bands, gateThreshold, mapThreshold,
          seed, nBuckets)
        try onBatch(accepted, epoch)
        finally accepted.unpersist(blocking = false)
      }
      .start()
}
