package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale model (1000 executors / 100 TB of vectors):
  *   - [[bruteForceTopK]]: the query set is broadcast (queries are small by
  *     assumption); each corpus partition scores its rows map-side against
  *     every query — one pass over the corpus, no corpus shuffle; the only
  *     shuffle is the per-query top-k reduction over (queries × k) rows.
  *   - [[lshTopK]]: corpus is pre-bucketed by a random-hyperplane sign sketch
  *     (the IVF-style scale path): each query probes only its own bucket plus
  *     `probes` nearest buckets by sketch hamming distance, turning the scan
  *     into a bucket-pruned join. Recall is tunable via planes/probes.
  */
object SimilaritySearch {

  /** Exact top-k neighbors for each query vector (cross score + windowed
    * top-k with deterministic id tie-break).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorFunctions.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** LSH-bucketed ANN: candidates share the query's hyperplane sketch within
    * `probes` flipped bits (multi-probe via explode over probe masks when
    * probes > 0). Exact cosine + top-k inside the candidate set.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, planes: Int, probes: Int,
              seed: Long = 42L): DataFrame = {
    require(planes <= 64)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      VectorFunctions.hyperplaneSketch(col(vecCol), planes, seed).as("bucket"))
    // probe masks: the identity plus single-bit flips for the first `probes` planes
    val masks = (0L +: (0 until probes).map(1L << _)).toArray
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        VectorFunctions.hyperplaneSketch(col(vecCol), planes, seed).as("qb"))
      .withColumn("bucket", explode(transform(lit(masks), m => col("qb").bitwiseXOR(m))))
    val scored = c.join(broadcast(q.drop("qb")), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorFunctions.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }
}
