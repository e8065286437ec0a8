package graft.streaming

import graft.operators.FreqSketch
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

/** Streaming frequent-items tracking: the mergeable Misra-Gries summary
  * ([[FreqSketch.MisraGries]], the batch `text_heavy_hitters` candidate
  * pass) carried as keyed state across micro-batches, emitting each key's
  * refreshed top-m tokens every batch that touches the key.
  *
  * Guarantee carried across time: after any number of batches totalling N
  * tokens for a key, every token with true count > N/(k+1) is present in
  * the state, and its estimate undercounts by at most N/(k+1) — the same
  * PODS'12 merge-tree argument as the batch aggregator, with micro-batches
  * as the merge order.
  *
  * Replay semantics (vs [[StreamingKmv]]): KMV state is a SET, so
  * source-side duplicate deliveries are absorbed; MG state is ADDITIVE, so
  * a duplicate DELIVERY of the same record counts twice. Spark's
  * checkpointed state versioning makes in-pipeline micro-batch replay safe
  * (state rolls back to the pre-batch version before re-applying), but an
  * at-least-once SOURCE should be deduped upstream ([[StreamingDedupe]])
  * when exact multiplicities matter.
  *
  * Scale: state per key is ≤2k (token, count) entries regardless of stream
  * length or vocabulary; each batch shuffles only its own rows to the
  * key's partition; RocksDB-backed via GraftSession's conf-gated provider.
  */
object StreamingHeavyHitters {

  /** One tracked token of a key's summary after folding a micro-batch.
    * `est` undercounts the true stream count by ≤ N_key/(k+1). */
  case class TopToken(key: String, rank: Int, token: String, est: Long)

  /** `rows`: a streaming DataFrame. Tracks token frequencies of `tokCol`
    * per `keyCol` with a k-entry MG summary, emitting the top-m estimates
    * per touched key each micro-batch. Output mode: Update.
    */
  def topTokens(rows: DataFrame, keyCol: String, tokCol: String,
                k: Int = 256, m: Int = 10): Dataset[TopToken] = {
    implicit val pairEnc = ExpressionEncoder[(String, String)]()
    implicit val bufEnc = ExpressionEncoder[FreqSketch.MgBuf]()
    implicit val outEnc = ExpressionEncoder[TopToken]()
    implicit val keyEnc = ExpressionEncoder[String]()
    val agg = new FreqSketch.MisraGries(k, 2 * k)
    rows
      .select(col(keyCol).cast("string").as("k"),
        col(tokCol).cast("string").as("tok"))
      // null key/token would hit the non-nullable tuple encoder; null
      // tokens carry no frequency, null keys can't address keyed state
      .na.drop(Seq("k", "tok"))
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, batch: Iterator[(String, String)],
         state: GroupState[FreqSketch.MgBuf]) =>
          var buf = state.getOption.getOrElse(agg.zero)
          batch.foreach { case (_, tok) => buf = agg.reduce(buf, tok) }
          state.update(buf)
          buf.entries.toSeq
            .sortBy { case (tok, c) => (-c, tok) }
            .take(m).zipWithIndex
            .map { case ((tok, c), i) => TopToken(key, i + 1, tok, c) }
            .iterator
      }
  }

  /** Output-mode companion: one refreshed top-m per touched key per batch. */
  val outputMode: OutputMode = OutputMode.Update
}
