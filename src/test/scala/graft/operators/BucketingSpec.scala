package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed joins must plan with NO shuffle exchange (co-located buckets)
  * and return the same rows as the plain join.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed join has no shuffle exchange and matches plain join") {
    val rnd = new scala.util.Random(23)
    val facts = (0 until 2000).map(i => (rnd.nextInt(100).toLong, i.toLong))
      .toDF("k", "payload")
    val dims = (0 until 100).map(k => (k.toLong, s"dim_$k")).toDF("k", "name")
    Bucketing.writeBucketed(facts, "bspec_facts", "k", 4)
    Bucketing.writeBucketed(dims, "bspec_dims", "k", 4)
    try {
      // force the SMJ path (a 100-row dim would otherwise broadcast)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.join(spark, "bspec_facts", "bspec_dims", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(1500))
      val got = joined.select($"k", $"payload", $"name")
        .as[(Long, Long, String)].collect().sorted.toSeq
      val expect = facts.join(dims, "k").select($"k", $"payload", $"name")
        .as[(Long, Long, String)].collect().sorted.toSeq
      assert(got == expect)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bspec_facts")
      spark.sql("DROP TABLE IF EXISTS bspec_dims")
    }
  }

  test("aggregation on the bucket key needs no exchange") {
    val facts = (0 until 500).map(i => (i.toLong % 50, i.toLong)).toDF("k", "v")
    Bucketing.writeBucketed(facts, "bspec_agg", "k", 4)
    try {
      val agg = spark.table("bspec_agg").groupBy("k").agg(sum("v").as("s"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(1500))
      assert(agg.agg(sum("s")).as[Long].head() == (0 until 500).map(_.toLong).sum)
    } finally spark.sql("DROP TABLE IF EXISTS bspec_agg")
  }

  test("partitioned write: time filter prunes partitions at the scan") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-part").toString
    val days = (0 until 10).flatMap(d => (0 until 50).map(i =>
      (f"2026-01-${d + 1}%02d", d * 50L + i)))
    Bucketing.writePartitioned(days.toDF("day", "v"), dir, "day")
    val all = spark.read.parquet(dir)
    val pruned = all.filter($"day" === "2026-01-03")
    val scan = pruned.queryExecution.executedPlan.toString
    // partition filter present and applied BEFORE I/O
    assert(scan.contains("PartitionFilters: [isnotnull(day"), scan.take(1200))
    assert(pruned.count() == 50)
    // pruning actually reduced the files read
    val prunedFiles = pruned.select(input_file_name()).distinct().count()
    val allFiles = all.select(input_file_name()).distinct().count()
    assert(prunedFiles == 1 && allFiles == 10)
  }
}
