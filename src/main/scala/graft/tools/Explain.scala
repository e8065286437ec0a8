package graft.tools

import graft._
import graft.operators.Dedup
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev: stage timing for the prefix-filtered ngram jaccard at sf0.1. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, "/root/testdata/sf0.1", "documents")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[x] $name%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s (rows=$n)")
    }
    val threshold = 0.8
    val sets = docs.select(col("doc_id").as("doc"), Dedup.shingleSet(col("text"), 3).as("sh_set"))
    time("sets kernel")(
      { sets.write.format("noop").mode("overwrite").save(); -1 })
    val sh = sets.select(col("doc"), size(col("sh_set")).as("n_sh"), explode(col("sh_set")).as("sh"))
    time("sh explode")(sh.count())
    val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    time("dfreq")(dfreq.count())
    val ranked = sh.join(dfreq, "sh")
      .withColumn("rk", row_number().over(Window.partitionBy("doc").orderBy(col("df"), col("sh"))))
      .filter(col("rk") <= floor(lit(1.0 - threshold) * col("n_sh")) + 1)
      .select("doc", "sh")
    time("ranked prefix")(ranked.count())
    val cands = ranked.as("a").join(ranked.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b")).distinct()
    time("cands")(cands.count())
    time("full operator")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8).count())
    spark.stop()
  }
}
