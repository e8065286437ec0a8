package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream: a new session starts when
  * the gap to the previous event of the same key exceeds `gapMicros`.
  *
  * Batch form: the classic lag + running-sum-of-boundaries pair of windows —
  * one shuffle on the key, two sorts fused into one per-partition pass.
  * Streaming form: Spark's native `session_window` aggregation (state-store
  * backed, watermark-driven eviction) — see [[sessionWindowStream]].
  */
object Sessionize {

  /** Per-event session ids: (key, session_id, plus input columns). */
  def assign(events: DataFrame, keys: Seq[String], orderUs: Column,
             gapMicros: Long, tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderUs, tieBreak)
    events
      .withColumn("_ord_us", orderUs)
      .withColumn("_new_sess",
        when(col("_ord_us") - lag(col("_ord_us"), 1).over(w) > gapMicros, 1)
          .when(lag(col("_ord_us"), 1).over(w).isNull, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("_new_sess")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("_new_sess")
  }

  /** Per-session rollup: bounds, event count. */
  def stats(events: DataFrame, keys: Seq[String], orderUs: Column,
            gapMicros: Long, tieBreak: Column): DataFrame =
    assign(events, keys, orderUs, gapMicros, tieBreak)
      .groupBy((keys.map(col) :+ col("session_id")): _*)
      .agg(count(lit(1)).as("n_events"),
        min(col("_ord_us")).as("start_us"),
        max(col("_ord_us")).as("end_us"))

  /** Streaming equivalent via the native session_window (for reference /
    * streaming jobs; state expires by watermark).
    */
  def sessionWindowStream(events: DataFrame, keys: Seq[String], ts: Column,
                          gap: String): DataFrame =
    events.groupBy((session_window(ts, gap) +: keys.map(col)): _*)
      .agg(count(lit(1)).as("n_events"))
}
