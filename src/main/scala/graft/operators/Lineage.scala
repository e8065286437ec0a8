package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative operators (pointer-jumping connected
  * components, PageRank): round k must not recompute rounds 1..k-1, so the
  * frame is checkpointed every few rounds.
  *
  * Two modes:
  *   - default: lazy `localCheckpoint` — blocks live in executor memory
  *     (disk-spillable), zero external storage. Fast, but NOT fault
  *     tolerant: on a real cluster an executor loss discards its blocks and
  *     kills the job mid-iteration.
  *   - `spark.graft.reliableCheckpoints=true`: reliable `checkpoint()` to
  *     the checkpoint dir (`spark.graft.checkpointDir`, or the context's
  *     already-set dir) — survives executor loss at the cost of a write to
  *     reliable storage per cut. This is the 100 TB setting: an hours-long
  *     iterative job WILL see executor churn, and re-running the whole
  *     iteration costs more than the checkpoint writes.
  *
  * Both are lazy (`eager = false`): the caller's next action (a convergence
  * probe, a stats aggregate) is the materializing job, so cut + probe cost
  * one job instead of two.
  */
object Lineage {
  val ReliableConf = "spark.graft.reliableCheckpoints"
  val DirConf = "spark.graft.checkpointDir"
  val LevelConf = "spark.graft.localCheckpointLevel"

  def cut(df: DataFrame): DataFrame = cut(df, eager = false)

  /** `eager = true` materializes the cut NOW — the exit-path variant for an
    * operator that wants to release its upstream caches before returning:
    * once the blocks exist, the returned frame no longer references the
    * cached parents, so `unpersist` can't degrade the result to a
    * recompute-from-scratch.
    */
  def cut(df: DataFrame, eager: Boolean): DataFrame = {
    val spark = df.sparkSession
    val reliable = spark.conf.getOption(ReliableConf).exists(_.toBoolean)
    if (reliable) {
      val sc = spark.sparkContext
      if (sc.getCheckpointDir.isEmpty)
        sc.setCheckpointDir(spark.conf.getOption(DirConf).getOrElse(
          s"${System.getProperty("java.io.tmpdir")}/graft-checkpoints"))
      df.checkpoint(eager = eager)
    } else spark.conf.getOption(LevelConf) match {
      // e.g. MEMORY_AND_DISK_SER: string-heavy intermediates (exploded
      // shingle/pair tables) occupy ~5-8x their serialized size as Java
      // objects — at an sf10-equivalent corpus on one 64 GB-heap node the
      // deserialized default blows the storage pool and thrashes
      // (measured: dedup_ngram_jaccard 876x at 100x data in the scale
      // rehearsal), while serialized blocks fit. Per-reuse deserialization
      // is the price, so this is a knob, not the default: small corpora
      // re-read the blocks many times per CC round and prefer objects.
      case Some(level) => df.localCheckpoint(eager = eager,
        org.apache.spark.storage.StorageLevel.fromString(level))
      case None => df.localCheckpoint(eager = eager)
    }
  }
}
