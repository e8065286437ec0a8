package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: densify an irregular event stream onto a
  * fixed bucket grid per key and forward-fill observation gaps (LOCF —
  * last observation carried forward).
  *
  * Bucket values are the MAX of the raw values inside the bucket: max is
  * commutative/associative (order-independent partial aggregation, exact on
  * doubles — no float-sum ordering hazard), so the per-bucket sample is
  * deterministic under any shuffle and replayable by a SQL oracle.
  *
  * Scale shape (100 TB): one hash agg to (key, bucket), one tiny agg to
  * per-key spans, then the grid explodes `sequence(lo, hi)` — bounded by
  * span/bucket-width, a caller-chosen granularity knob (coarsen the bucket
  * for long-lived keys; a key's grid is its span, not its event count). The
  * fill itself is a running window per key ordered by bucket: a single
  * shuffle on the key, each partition sorted once. Keys are independent —
  * no global sort, no driver collect.
  */
object TimeSeriesOps {

  /** Densify + forward-fill.
    *
    * @param events    rows with `keyCol`, a long `bucketCol` (precomputed
    *                  time bucket), and `valueCol`
    * @return (key, bucket, value_filled, n_events) — one row per key per
    *         bucket from the key's first to last observed bucket;
    *         `value_filled` is the latest bucket-max at or before the
    *         bucket (never null — the grid starts at an observed bucket);
    *         `n_events` is 0 on gap rows.
    */
  def gapFill(events: DataFrame, keyCol: String, bucketCol: String,
              valueCol: String): DataFrame = {
    val perBucket = events.groupBy(keyCol, bucketCol).agg(
      max(valueCol).as("bucket_value"),
      count(lit(1)).as("n_events"))
    val spans = perBucket.groupBy(keyCol).agg(
      min(bucketCol).as("lo"), max(bucketCol).as("hi"))
    val grid = spans.select(
      col(keyCol), explode(sequence(col("lo"), col("hi"))).as(bucketCol))
    val fill = Window.partitionBy(keyCol).orderBy(bucketCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perBucket, Seq(keyCol, bucketCol), "left")
      .select(col(keyCol), col(bucketCol),
        last(col("bucket_value"), ignoreNulls = true).over(fill)
          .as("value_filled"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
  }
}
