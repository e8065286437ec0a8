package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.WindowExpression
import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}

/** Dev probe: list every query whose OPTIMIZED plan contains a Window with
  * an empty partition spec — the "Moving all data to a single partition"
  * scale-killer. Run: sbt "runMain graft.tools.WindowScan [sfdir]".
  */
object WindowScan {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.tune(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = args.drop(1)
    val qs = if (only.nonEmpty) only.map(n => n -> SparkEntry.queries(n)).toSeq
             else SparkEntry.queries.toSeq.sortBy(_._1)
    qs.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sf)
        val bad = df.queryExecution.optimizedPlan.collect {
          case w: LWindow if w.partitionSpec.isEmpty => w
        }
        if (bad.nonEmpty)
          println(s"GLOBAL_WINDOW $name: ${bad.size} node(s) " +
            bad.map(_.windowExpressions.map {
              case e => e.toString.take(60) }.mkString(";")).mkString(" | "))
        // EXECUTE too: physical planning may degrade a partitioned window
        // (e.g. a foldable partition key) in ways the logical scan misses
        System.err.println(s"[windowscan] executing $name")
        df.write.format("noop").mode("overwrite").save()
      } catch { case e: Throwable =>
        println(s"ERROR $name: ${e.getMessage.linesIterator.next()}")
      }
    }
    spark.stop()
  }
}
