package graft.tools

import graft._
import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev profiling harness: times sub-stages of the slow queries so perf work
  * targets measurements instead of guesses. `runMain graft.tools.Profile <sfDir>`.
  */
object Profile {
  def time(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[profile] $name%-42s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
  }

  def noop(df: DataFrame): Long = {
    df.write.format("noop").mode("overwrite").save(); -1L
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")

    val events = Tables(spark, dir, "events")
    val docs = Tables(spark, dir, "documents")

    time("events scan")(events.count())
    time("events + envelope concat")(noop(events.select(
      concat(lit("{\"after\": "), col("props"), lit("}")).as("e"))))
    time("events + get_json_object")(noop(events.select(
      get_json_object(concat(lit("{\"after\": "), col("props"), lit("}")),
        "$.after.k").as("k"))))
    time("cdc_parse no orderBy")(noop(
      SparkEntry.queries("cdc_parse_entities")(spark, dir)
        .queryExecution.analyzed.children.headOption
        .map(_ => SparkEntry.queries("cdc_parse_entities")(spark, dir))
        .get))
    val parse = SparkEntry.queries("cdc_parse_entities")(spark, dir)
    time("cdc_parse full (again)")(noop(parse))

    val toks = Dedup.shingles(col("text"), 3)
    time("docs shingles explode")(
      docs.select(explode(array_distinct(toks))).count())
    val sigs = docs.select(col("doc_id"),
      VectorFunctions.minhashSig(Dedup.shingles(col("text"), 3), 64).as("sig"))
    time("minhash signatures")(noop(sigs))
    val rows = 4
    val bandStructs = (0 until 16).map { b =>
      struct(lit(b).as("band"), xxhash64(slice(col("sig"), b * rows + 1, rows)).as("bhash"))
    }
    val banded = sigs.select(col("doc_id"), explode(array(bandStructs: _*)).as("l"))
      .select(col("doc_id"), col("l.band"), col("l.bhash"))
    time("banded explode")(noop(banded))
    time("band self-join candidates")(
      banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bhash") === col("b.bhash") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).distinct().count())
    time("minhash full operator")(
      Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 64, 16, 0.8).count())
    spark.stop()
  }
}
