package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC state materializations — the two standard consumers of a deduplicated
  * change stream (the step AFTER the reference's pipeline, which stops at
  * emitting id batches; cf. WatchStream.java:286-293):
  *
  *   - [[compact]]: type-1 / latest-state — one row per key, the newest
  *     version wins (log compaction).
  *   - [[historize]]: type-2 / SCD2 — every version becomes a validity
  *     interval [valid_from, valid_to) with an `is_current` flag.
  *
  * Scale: both are one shuffle on the key. `compact` is a `max_by` hash
  * aggregate (map-side partial combine — input >> keys at 100 TB, so the
  * exchange carries one row per key per map task). `historize` is a window
  * `lead` — the full version history must be co-located per key, which is
  * exactly the SCD2 contract; version counts per key are small and bounded,
  * so there is no skew risk beyond a genuinely hot key.
  */
object Scd2 {

  /** Latest-state compaction: keep the newest version per key group
    * ("newest" = max `order`), carrying `payload` columns from that version.
    * The mirror of [[Dedupe.keepFirstAgg]] with max semantics.
    */
  def compact(df: DataFrame, keys: Seq[String], order: Column,
              payload: Seq[String]): DataFrame = {
    val packed = struct(order.as("_ord") +: payload.map(p => col(p).as(p)): _*)
    df.groupBy(keys.map(col): _*)
      .agg(max(packed).as("_last"))
      .select(keys.map(col) ++ payload.map(p => col(s"_last.$p").as(p)): _*)
  }

  /** MERGE-style change application: upsert/delete a compacted change set
    * into a base snapshot (the warehouse "apply CDC to the table" step the
    * reference leaves to its consumers).
    *
    * `changes` rows carry `opCol` ('D' = delete, anything else = upsert);
    * per key only the NEWEST change (max `order`) decides. Result =
    * untouched base rows + upserted latest versions; deleted keys drop.
    *
    * Plan shape: compact the changes (map-side-combinable hash agg), then
    * base LEFT ANTI touched-keys UNION upserts — two joins that both
    * broadcast when the change set is small relative to the snapshot (the
    * normal CDC regime; `broadcastChanges = false` falls back to shuffle
    * joins for snapshot-sized change sets). No full-outer sort-merge join:
    * the base table streams through untouched.
    */
  def applyChanges(base: DataFrame, changes: DataFrame, keys: Seq[String],
                   order: Column, opCol: Column, payload: Seq[String],
                   broadcastChanges: Boolean = true): DataFrame = {
    val latest = compact(changes.withColumn("_op", opCol), keys, order,
      payload :+ "_op")
    def bc(df: DataFrame) = if (broadcastChanges) broadcast(df) else df
    val untouched = base.select((keys ++ payload).map(col): _*)
      .join(bc(latest.select(keys.map(col): _*)), keys, "left_anti")
    val upserts = latest.filter(col("_op") =!= "D")
      .select((keys ++ payload).map(col): _*)
    untouched.unionByName(upserts)
  }

  /** SCD2 historization: each version row gains
    *   `valid_from` = its own `order` value,
    *   `valid_to`   = the NEXT version's order (null while current),
    *   `is_current` = valid_to IS NULL.
    * Half-open intervals [valid_from, valid_to) — adjacent versions chain
    * without overlap, the standard warehouse contract.
    */
  def historize(df: DataFrame, keys: Seq[String], order: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order)
    df.withColumn("valid_from", order)
      .withColumn("valid_to", lead(order, 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
