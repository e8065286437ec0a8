package graft.tools

import graft._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dev: print one query's finalized physical plan. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q1_pricing_summary")
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.tune(SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val exec = df.queryExecution.executedPlan
    val fin = exec.collectFirst { case a: AdaptiveSparkPlanExec => a.executedPlan }
      .getOrElse(exec)
    println("PLAN_BEGIN")
    println(fin.toString)
    println("PLAN_END")
    spark.stop()
  }
}
