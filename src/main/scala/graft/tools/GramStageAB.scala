package graft.tools

import graft._
import graft.functions.{TextExpressions, TextFunctions}
import org.apache.spark.sql.functions._

/** Dev: interleaved same-JVM A/B of repeatedSubstringSpans' gram stage —
  * the pre-r17 transform+md5/conv expression vs the posGramHashes kernel —
  * isolating the disputed stage from the rest of the query (host windows
  * this session could not adjudicate the full-query wall). Times the
  * explode+count of each variant alternately, 7 rounds each.
  */
object GramStageAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = 8
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, dir, "documents")
    val toks = TextFunctions.tokens(col("text"))
    val oldGrams = when(size(toks) < n,
        expr("cast(array() as array<struct<p:int,h:bigint>>)"))
      .otherwise(transform(sequence(lit(0), size(toks) - n), i =>
        struct(i.cast("int").as("p"),
          conv(substring(md5(array_join(slice(toks, i + 1, lit(n)), " ")),
            1, 15), 16, 10).cast("long").as("h"))))
    val newGrams = TextExpressions.posGramHashes(toks, n)
    def run(g: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      docs.select(col("doc_id"), explode(g).as("x"))
        .select(col("doc_id"), col("x.p"), col("x.h"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run(oldGrams); run(newGrams) // warmup both
    val olds = scala.collection.mutable.ArrayBuffer[Double]()
    val news = scala.collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to 7) { olds += run(oldGrams); news += run(newGrams) }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"ABRESULT old=${med(olds.toSeq)}%.3f new=${med(news.toSeq)}%.3f " +
      s"olds=${olds.map(x => f"$x%.3f").mkString(",")} " +
      s"news=${news.map(x => f"$x%.3f").mkString(",")}")
    spark.stop()
  }
}
