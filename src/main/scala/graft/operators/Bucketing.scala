package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table co-location: pre-shuffle a table ONCE at write time
  * (`bucketBy` + `sortBy` on the join/agg key) so every later equi-join or
  * aggregation on that key runs shuffle-free — Spark reads each bucket as a
  * pre-partitioned, pre-sorted split and plans SortMergeJoin with no
  * Exchange and no per-query Sort.
  *
  * The 100 TB economics: a fact table joined k times amortizes one shuffle
  * (the bucketed write) over k queries; bucket count should be sized so
  * bucket ≈ 100–500 MB at target scale (here parameterized). Both sides must
  * bucket on the same key with the same count for co-location; a dimension
  * small enough to broadcast should broadcast instead (bucketing only beats
  * broadcast when both sides are big).
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted managed table (idempotent overwrite). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Co-located equi-join of two bucketed tables (plans with zero Exchange
    * when both were written via [[writeBucketed]] with equal bucket counts).
    */
  def join(spark: SparkSession, leftTable: String, rightTable: String,
           key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Hive-style partitioned layout — the other half of the 100 TB scan
    * story: a time-partitioned fact table turns every time-bounded query
    * into a directory prune (the scan's `PartitionFilters`), skipping data
    * proportionally to the filter's selectivity BEFORE any I/O. Partition
    * column cardinality must stay modest (days, not seconds — small-file
    * explosion is the failure mode this guards with a per-partition
    * repartition).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String,
                       filesPerPartition: Int = 1): Unit =
    df.repartition(filesPerPartition,
        org.apache.spark.sql.functions.col(partitionCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(path)
}
