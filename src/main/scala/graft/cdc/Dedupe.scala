package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keep-first deduplication — the reference's
  * `Collectors.toMap(entityId, identity, (a,b) -> a)` (WatchStream.java:272-274):
  * within a window, the FIRST arrival per key survives.
  *
  * Two physical strategies:
  *   - [[keepFirstAgg]]: `min_by`-style single aggregation. Partial (map-side)
  *     aggregation halves the shuffle before the exchange — the right default
  *     at 100 TB, where dedupe input >> distinct keys.
  *   - [[keepFirstRows]]: window `row_number`, when all payload columns of the
  *     surviving row are needed without enumerating them. One shuffle, no
  *     partial agg — use only when the row is wide and dynamic.
  *
  * Cross-window semantics: the reference's dedupe state RESETS at each buffer
  * flush (an id re-arriving after a flush is emitted again — asserted by its
  * own tests, SURVEY §2.4 D1). Batch mode = one window; streaming mode applies
  * this per micro-batch in [[graft.streaming.CdcStream]].
  */
object Dedupe {

  /** Keep the first row per key group, "first" = smallest `order` value.
    * `payload` columns are carried through via a packed struct min — a single
    * hash aggregate with map-side partial combine (no window, no sort).
    */
  def keepFirstAgg(df: DataFrame, keys: Seq[String], order: Column,
                   payload: Seq[String]): DataFrame = {
    val packed = struct(order.as("_ord") +: payload.map(p => col(p).as(p)): _*)
    df.groupBy(keys.map(col): _*)
      .agg(min(packed).as("_first"))
      .select(keys.map(col) ++ payload.map(p => col(s"_first.$p").as(p)): _*)
  }

  /** Keep-first via row_number window — preserves the full row. */
  def keepFirstRows(df: DataFrame, keys: Seq[String], order: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Set-semantics dedupe (survivor arbitrary) — cheapest form, for when the
    * caller only needs the distinct keys. Partial-aggregated `distinct`.
    */
  def distinctKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.select(keys.map(col): _*).distinct()
}
