package graft.streaming

import graft.functions.KmvSketch
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

/** Streaming distinct-count estimation: the KMV bottom-k sketch
  * ([[KmvSketch]], the batch `q_approx_distinct_kmv` path) carried as keyed
  * state across micro-batches, emitting a refreshed per-key estimate each
  * batch that saw the key.
  *
  * Why a sketch and not a counter: KMV state is a SET of the k smallest
  * hashes, so updates are idempotent — a micro-batch replayed after a
  * failure (at-least-once delivery) folds in the same hashes and changes
  * nothing. A count-based state would double-count on replay; the sketch is
  * exactly-once-correct under at-least-once delivery for free
  * (StreamingKmvSpec pins both laws).
  *
  * Scale: state per key is <= k longs (k=64 → 512 bytes) regardless of
  * stream cardinality, store-backed (RocksDB via GraftSession's conf-gated
  * provider) and partitioned by key; each micro-batch shuffles only its own
  * rows to their key's partition — the same mergeable-partial-aggregate
  * shape as the batch sketch, unrolled over time.
  */
object StreamingKmv {

  /** Per-key running estimate after folding a micro-batch.
    * `n_tracked` < k means the estimate is exact. */
  case class Estimate(key: String, n_tracked: Int, estimate: Long)

  /** `rows`: a streaming DataFrame. Distinct values of `valueCol` are
    * estimated per `keyCol` via the same 60-bit md5 hash as the batch
    * query (engine-neutral, deterministic). Output mode: Update.
    */
  def distinctEstimates(rows: DataFrame, keyCol: String, valueCol: String,
                        k: Int = 64): Dataset[Estimate] = {
    implicit val pairEnc = ExpressionEncoder[(String, Long)]()
    implicit val bufEnc = ExpressionEncoder[KmvSketch.Buf]()
    implicit val outEnc = ExpressionEncoder[Estimate]()
    implicit val keyEnc = ExpressionEncoder[String]()
    val agg = new KmvSketch.KmvAgg(k)
    rows
      .select(col(keyCol).cast("string").as("k"),
        expr(s"cast(conv(substring(md5(cast($valueCol as string)), 1, 15), " +
          "16, 10) as bigint)").as("h"))
      // a null key or null value (md5(null) -> null) would hit the
      // non-nullable (String, Long) encoder and kill the query at runtime.
      // Null VALUES contribute no distinct value (count(distinct) ignores
      // NULLs). Null KEYS are dropped DELIBERATELY: a batch GROUP BY would
      // emit a null-key group, but keyed state cannot be addressed by a
      // null key here — reconcile against batch with a null-key filter.
      .na.drop(Seq("k", "h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: String, batch: Iterator[(String, Long)],
         state: GroupState[KmvSketch.Buf]) =>
          var buf = state.getOption.getOrElse(agg.zero)
          batch.foreach { case (_, h) => buf = agg.reduce(buf, h) }
          state.update(buf)
          Estimate(key, buf.vals.length, KmvSketch.estimate(buf.vals, k))
      }
  }

  /** Output-mode companion: [[distinctEstimates]] emits one refreshed row
    * per key per batch, so sinks should run in Update mode. */
  val outputMode: OutputMode = OutputMode.Update
}
