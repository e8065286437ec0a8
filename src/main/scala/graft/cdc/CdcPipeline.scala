package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The full reference data plane (SURVEY §3.2), batch form, composed from the
  * stage modules. One micro-batch of CDC records goes:
  *
  *   parse envelope → extract entity id → broadcast fan-out to targets →
  *   keep-first dedupe per (target, entity) → chunk to ≤ maxSize →
  *   JSON id arrays per target.
  *
  * The reference's ref-counted ack protocol (F1, A1–A7) is intentionally
  * absent: under Spark's epoch/offset commit a micro-batch commits only after
  * every sink write succeeds, which subsumes the countdown with stronger
  * (exactly-once into idempotent sinks) semantics. See SURVEY §7.3.
  *
  * Input contract: a DataFrame with columns
  *   `id` (source offset, any orderable type), `table` (source table name),
  *   `envelope` (Debezium JSON string).
  */
object CdcPipeline {

  /** Decode + project: envelope JSON → integer entity id per routed column.
    * Join to routes FIRST so each (table, column) edge extracts its own
    * column — the generalization of the reference's first-column quirk
    * (SURVEY §2.3 note). The extraction stays a codegen'd JSON path get.
    */
  def parseAndRoute(records: DataFrame, routes: DataFrame): DataFrame = {
    val routed = records.join(broadcast(routes),
      records("table") === routes("table"), "inner")
    // per-edge column extraction: parse the envelope's `after` image as a
    // map and index it by the route's column (a dynamic path — Catalyst's
    // OptimizeJsonExprs prunes the unused `before` branch from the parse)
    routed.select(
      records("id"), records("table"), routes("column"), routes("target"),
      element_at(
        from_json(records("envelope"), Envelope.schema).getField("after"),
        routes("column")).try_cast("int").as("entity_id"))
  }

  /** Full plane: parse/route → drop nulls (reference would crash; we filter,
    * see Envelope.rejects) → keep-first per (target, entity_id) by offset →
    * ordered chunks of ≤ maxSize ids.
    */
  def run(records: DataFrame, routes: DataFrame, maxBatch: Int): DataFrame = {
    val routed = parseAndRoute(records, routes).filter(col("entity_id").isNotNull)
    val deduped = Dedupe.keepFirstAgg(
      routed, Seq("target", "entity_id"), col("id"), Seq("id"))
    Batcher.chunkIds(deduped, "target", "entity_id", maxBatch, col("id"))
  }
}
