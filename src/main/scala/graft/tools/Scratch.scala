package graft.tools

import graft.{GraftSession, SparkEntry, Tables}
import graft.operators.SimilaritySearch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway measurement harness (not committed). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tune(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      println(s"=== $sf")
      val ev = Tables(spark, sf, "events")
      val err = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("xu"),
          approx_count_distinct(col("user_id"), 0.02).as("au"),
          countDistinct(col("event_id")).as("xe"),
          approx_count_distinct(col("event_id"), 0.02).as("ae"))
        .select(col("event_type"),
          (abs(col("au") - col("xu")) / col("xu")).as("user_err"),
          (abs(col("ae") - col("xe")) / col("xe")).as("event_err"))
        .collect()
      err.foreach(r => println(f"HLL ${r.getString(0)}%-10s user_err=${r.getDouble(1)}%.4f event_err=${r.getDouble(2)}%.4f"))

      val e = Tables(spark, sf, "embeddings")
      val q = e.filter(col("vec_id") < 10)
      val exact = SimilaritySearch.bruteForceTopK(q, e, "vec_id", "embedding", 10)
        .select("query_id", "neighbor_id")
      val lsh = SimilaritySearch.lshTopK(q, e, "vec_id", "embedding", 10, planes = 8, probes = 4)
        .select("query_id", "neighbor_id")
      val ivf = SimilaritySearch.ivfTopK(q, e, "vec_id", "embedding", 10,
        nlist = 16, nprobe = 4, iters = 2, sampleMod = 4)
        .select("query_id", "neighbor_id")
      def recall(name: String, approx: org.apache.spark.sql.DataFrame): Unit = {
        val r = exact.join(approx, Seq("query_id", "neighbor_id"))
          .groupBy("query_id").agg(count(lit(1)).as("hit"))
          .select(col("query_id"), (col("hit") / 10.0).as("recall"))
          .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
        println(s"$name recall per query: " + r.map(x => f"${x._1}:${x._2}%.2f").mkString(" "))
        println(f"$name min recall: ${r.map(_._2).min}%.2f")
      }
      recall("LSH", lsh)
      recall("IVF", ivf)
    }
    spark.stop()
  }
}
