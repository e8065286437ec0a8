package graft.tools

import graft._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dev: audit physical plans for scale anti-patterns. Executes each query
  * (noop sink) so AQE finalizes, then inspects the FINAL plan: unexpected
  * nested-loop/cartesian joins, parquet scans without column pruning
  * (ReadSchema wider than needed is approximated by full-table width).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.tune(SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        df.write.format("noop").mode("overwrite").save()
        val exec = df.queryExecution.executedPlan
        val finalPlan = exec.collectFirst { case a: AdaptiveSparkPlanExec => a.executedPlan }
          .getOrElse(exec)
        val s = finalPlan.toString
        // scans: report column counts actually read per parquet scan
        val scans = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(s)
          .map(_.group(1).count(_ == ':')).toList
        // NOTE: codegen spans are not visible here — AQE applies codegen per
        // query stage at execution; use df.explain("codegen") to inspect.
        val flags = Seq(
          "NESTED_LOOP" -> s.contains("BroadcastNestedLoopJoin"),
          "CARTESIAN" -> s.contains("CartesianProduct"),
          "WIDE_SCAN" -> scans.exists(_ > 8))
          .collect { case (f, true) => f }
        println(s"AUDIT $name scans=${scans.mkString("/")} ${if (flags.isEmpty) "ok" else flags.mkString(",")}")
      } catch { case e: Throwable => println(s"AUDIT $name ERROR ${e.getMessage}") }
    }
    spark.stop()
  }
}
