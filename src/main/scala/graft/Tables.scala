package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided parquet tables (`TESTDATA.md`).
  *
  * All reads are plain parquet scans so Catalyst pushes filters and prunes
  * columns into the file source — at 100 TB the scan is the dominant cost and
  * pushdown/pruning is the first-order optimization.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Tables whose downstream per-row compute (JSON parse, shingling, large
    * aggregation) warrants re-balancing when the scan yields few splits.
    * Dimension tables stay as-is — they broadcast anyway, and repartitioning
    * under a broadcast just adds a stage.
    */
  private val heavy = Set("events", "documents", "lineitem")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val norm = if (name == "events") normalizeEventTs(df) else df
    if (heavy(name)) balance(spark, norm) else norm
  }

  /** Single-row-group local files scan as ONE task, serializing all per-row
    * compute downstream. Repartition up to the cluster's parallelism when the
    * scan yields fewer splits — a no-op on real multi-file/multi-row-group
    * datasets (100 TB inputs always have ≥ cores splits), a 32× win locally.
    * Explicit numPartitions so AQE doesn't coalesce it back down; Catalyst
    * still pushes filters/pruning through the repartition into the scan.
    */
  def balance(spark: SparkSession, df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    // toRdd: physical-plan partition count without df.rdd's row-conversion
    // lineage (no job runs either way; this skips the deserializer layer)
    if (df.queryExecution.toRdd.getNumPartitions < target)
      df.repartition(target)
    else df
  }

  /** Normalize `events.ts` to a proper TimestampType (microsecond) column
    * plus raw nanos (`ts_ns`) for total ordering, whatever timestamp layout
    * the parquet carries. Real-world parquet arrives in all of
    * TIMESTAMP millis/micros/nanos × adjusted/unadjusted-to-UTC:
    *   - TIMESTAMP(NANOS) → LongType under `nanosAsLong`
    *   - `isAdjustedToUTC=0` micros/millis → TimestampNTZType; under the
    *     UTC session time zone ([[GraftSession.tune]]) a cast to
    *     TimestampType preserves the wall-clock micros bit-for-bit
    *   - `isAdjustedToUTC=1` → TimestampType, used as-is
    */
  private def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumnRenamed("ts", "ts_ns")
          // integer `div`, NOT `/`: ns epochs (~1.7e18) exceed double's 2^53
          // integer range, so float division truncates differently by ±1µs
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
      case _ =>
        df.withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
    }
}
