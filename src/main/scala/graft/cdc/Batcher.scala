package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Output batching — the reference's ≤1000-id JSON-array records
  * (WatchStream.java:284-293): surviving ids are chunked per target and
  * serialized as `[id,id,...]`.
  *
  * Chunk assignment uses `row_number` per target (one shuffle on `target`,
  * then a per-partition sort). At 100 TB the per-target window is the skew
  * risk — a hot target serializes through one task. Mitigations, in order:
  * AQE skew handling does not apply to windows, so for hot targets use
  * [[chunkIdsHashed]] (salted, order-free; keeps the ≤size bound exactly,
  * drops the arrival-order guarantee — which the reference never promised
  * across its concurrent buffers anyway).
  */
object Batcher {

  /** Deterministic ordered chunking: ids per target sorted by `order`,
    * grouped into consecutive chunks of ≤ `maxSize`, serialized as a JSON
    * int array (`{"ids": "[1,2,3]"}` in the reference's output shape).
    */
  def chunkIds(df: DataFrame, targetCol: String, idCol: String,
               maxSize: Int, order: Column): DataFrame = {
    val w = Window.partitionBy(col(targetCol)).orderBy(order)
    df.withColumn("_rn", row_number().over(w))
      .withColumn("chunk_no", ((col("_rn") - 1) / maxSize).cast("long"))
      .groupBy(col(targetCol), col("chunk_no"))
      .agg(
        concat(lit("["),
          array_join(transform(sort_array(collect_list(col(idCol))),
            _.cast("string")), ","),
          lit("]")).as("ids"),
        count(lit(1)).as("n_ids"))
  }

  /** Salted chunking for hot targets: chunk = hash(id) % nChunks with nChunks
    * sized so each chunk ≤ maxSize w.h.p.; fully parallel, no window.
    */
  def chunkIdsHashed(df: DataFrame, targetCol: String, idCol: String,
                     nChunks: Int): DataFrame =
    df.withColumn("chunk_no", pmod(xxhash64(col(idCol)), lit(nChunks)).cast("long"))
      .groupBy(col(targetCol), col("chunk_no"))
      .agg(
        concat(lit("["),
          array_join(transform(sort_array(collect_list(col(idCol))),
            _.cast("string")), ","),
          lit("]")).as("ids"),
        count(lit(1)).as("n_ids"))
}
