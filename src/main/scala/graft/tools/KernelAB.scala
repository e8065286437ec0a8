package graft.tools

import graft._
import graft.functions.{TextExpressions, TextFunctions}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dev: interleaved same-JVM A/B of the r17 kernel replacements vs their
  * pre-r17 higher-order-lambda forms, each isolated to its own stage
  * (explode/select + noop). Controls for host drift the way GramStageAB
  * does: variants alternate inside one JVM and window.
  */
object KernelAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, dir, "documents")
    val toks = TextFunctions.tokens(col("text"))

    def time(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def ab(name: String, mk: Map[String, Column]): Unit = {
      val dfs = mk.map { case (k, c) =>
        k -> docs.select(col("doc_id"), explode(c).as("x"))
      }
      dfs.values.foreach(time) // warmup
      val acc = scala.collection.mutable.Map[String, List[Double]]()
        .withDefaultValue(Nil)
      for (_ <- 1 to 7) dfs.foreach { case (k, df) => acc(k) = time(df) :: acc(k) }
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      println("ABRESULT " + name + " " + mk.keys.toSeq.sorted
        .map(k => f"$k=${med(acc(k))}%.3f").mkString(" "))
    }

    // chunks (8, 8): old transform/slice/array_join vs kernel
    val oldChunks = {
      val n = size(toks)
      val extra = greatest(n - 8, lit(0))
      val nChunks = lit(1) + ceil(extra.cast("double") / 8).cast("int")
      transform(sequence(lit(0), nChunks - 1), i => {
        val piece = slice(toks, i * 8 + 1, lit(8))
        struct(i.as("chunk_no"), array_join(piece, " ").as("chunk"),
          size(piece).as("n_tokens"))
      })
    }
    ab("chunks", Map("old" -> oldChunks,
      "new" -> TextExpressions.tokenChunks(toks, 8, 8)))

    // shingles n=2 (with multiplicity, whole-text short-doc convention)
    val oldShingles = when(size(toks) < 2, array(array_join(toks, " ")))
      .otherwise(transform(sequence(lit(0), size(toks) - 2),
        i => array_join(slice(toks, i + 1, lit(2)), " ")))
    ab("shingles2", Map("old" -> oldShingles,
      "new" -> TextExpressions.shingleList(toks, 2)))

    // ngramList n=2 (empty-list short-doc convention)
    val oldNgrams = when(size(toks) < 2, expr("cast(array() as array<string>)"))
      .otherwise(transform(sequence(lit(0), size(toks) - 2),
        i => array_join(slice(toks, i + lit(1), lit(2)), " ")))
    ab("ngramList2", Map("old" -> oldNgrams,
      "new" -> TextExpressions.ngramList(toks, 2)))

    // adjacent pairs: old transform struct vs kernel
    val oldPairs = when(size(toks) < 2,
        expr("cast(array() as array<struct<w1:string,w2:string>>)"))
      .otherwise(transform(sequence(lit(0), size(toks) - 2),
        i => struct(element_at(toks, i + 1).as("w1"),
          element_at(toks, i + 2).as("w2"))))
    ab("adjPairs", Map("old" -> oldPairs,
      "new" -> TextExpressions.adjacentPairs(toks)))

    spark.stop()
  }
}
