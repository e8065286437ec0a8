package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** `events.ts` is written with parquet TIMESTAMP(NANOS), which Spark reads
    * as LongType under `nanosAsLong`. Normalize to a proper TimestampType
    * (microsecond) column plus the raw nanos for total ordering.
    */
  private def normalizeEventTs(df: DataFrame): DataFrame =
    if (df.schema("ts").dataType == LongType)
      df.withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", timestamp_micros((col("ts_ns") / 1000L).cast(LongType)))
    else df.withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
}
