package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** File-format source/sink matrix: the engine's tables round-trip through
  * parquet, CSV, and JSON with schema intact (the reference has no file
  * formats at all — SURVEY §2.8; here they come free from Spark's DSv2
  * sources, so we pin the behavior).
  */
class SourceFormatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs =
    Seq((1L, "alpha beta", "en"), (2L, "gamma delta", "de"),
      (3L, "epsilon", "es"))
      .toDF("doc_id", "text", "lang")

  private def roundTrip(fmt: String,
                        opts: Map[String, String]): Seq[(Long, String, String)] = {
    val dir = Files.createTempDirectory(s"graft-fmt-$fmt").toString + "/data"
    docs.write.options(opts).format(fmt).save(dir)
    val back = spark.read.options(opts).format(fmt)
      .schema(docs.schema) // explicit schema: no inference drift
      .load(dir)
    back.select("doc_id", "text", "lang").as[(Long, String, String)]
      .collect().sortBy(_._1).toSeq
  }

  test("parquet, csv, and json round-trip with identical rows") {
    val expect = docs.as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(roundTrip("parquet", Map.empty) == expect)
    assert(roundTrip("csv", Map("header" -> "true")) == expect)
    assert(roundTrip("json", Map.empty) == expect)
  }

  test("csv scan prunes columns and pushes filters into the scan node") {
    val dir = Files.createTempDirectory("graft-fmt-push").toString + "/data"
    docs.write.option("header", "true").csv(dir)
    val q = spark.read.option("header", "true").schema(docs.schema).csv(dir)
      .filter(col("doc_id") > 1L).select("doc_id")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,1)]")
      || plan.contains("GreaterThan(doc_id,1)"), plan.take(800))
    assert(q.as[Long].collect().sorted.toSeq == Seq(2L, 3L))
  }
}
