package graft.tools

import graft._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan scale audit: unexpected nested-loop/cartesian joins, scans
  * without column pruning, missing parquet filter pushdown. The library
  * half ([[audit]]) is asserted over every SparkEntry query by
  * PlanAuditSpec — a plan regression (a filter that stops pushing, a join
  * that degrades to a cartesian) fails `sbt test`, not just a dev glance.
  */
object PlanAudit {

  /** Findings for one executed query plan. `scanWidths` = columns read per
    * parquet scan (column-pruning proxy); `pushedFilters` = the data
    * filters each parquet scan pushed (empty entries mean a full-scan).
    */
  case class Audit(flags: Seq[String], scanWidths: Seq[Int],
                   pushedFilters: Seq[String])

  /** Executes `df` (noop sink) so AQE finalizes, then audits the FINAL
    * adaptive plan. `maxScanWidth` caps columns per scan (the widest
    * driver-contract query reads 8 of lineitem's 16).
    */
  def audit(df: DataFrame, maxScanWidth: Int = 8): Audit = {
    df.write.format("noop").mode("overwrite").save()
    val exec = df.queryExecution.executedPlan
    val finalPlan = exec.collectFirst { case a: AdaptiveSparkPlanExec => a.executedPlan }
      .getOrElse(exec)
    val s = finalPlan.toString
    val scans = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(s)
      .map(_.group(1).count(_ == ':')).toList
    val pushed = "PushedFilters: \\[([^\\]]*)\\]".r.findAllMatchIn(s)
      .map(_.group(1)).toList
    // empty-partition-spec windows = WindowExec's "moving all data to a
    // single partition". Checked on the PHYSICAL plan because the round-7
    // lesson is that a lit(0) partition key constant-folds away — the
    // logical plan looks partitioned, the executed one is not. Manual
    // recursion: AQE query stages hold their subtree as a member, not a
    // child, so TreeNode.collect alone would skip everything below them.
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val below = p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          allNodes(q.plan)
        case _ => Nil
      }
      p +: (p.children.flatMap(allNodes) ++ below)
    }
    val globalWindow = allNodes(finalPlan).exists {
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        w.partitionSpec.isEmpty
      case _ => false
    }
    val flags = Seq(
      "NESTED_LOOP" -> s.contains("BroadcastNestedLoopJoin"),
      "CARTESIAN" -> s.contains("CartesianProduct"),
      "WIDE_SCAN" -> scans.exists(_ > maxScanWidth),
      "GLOBAL_WINDOW" -> globalWindow)
      .collect { case (f, true) => f }
    Audit(flags, scans, pushed)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.tune(SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val a = audit(fn(spark, dir))
        println(s"AUDIT $name scans=${a.scanWidths.mkString("/")} " +
          (if (a.flags.isEmpty) "ok" else a.flags.mkString(",")))
      } catch { case e: Throwable => println(s"AUDIT $name ERROR ${e.getMessage}") }
    }
    spark.stop()
  }
}
