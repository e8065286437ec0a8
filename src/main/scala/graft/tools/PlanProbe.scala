package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc exchange counter for one named query (dev diagnostic):
  * `runMain graft.tools.PlanProbe <query> [sfDir]` prints the executed
  * plan's Exchange/AQEShuffleRead/Broadcast counts and the plan itself.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = graft.GraftSession.tune(SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    // construction INSIDE the timer: iterative operators run driver loops
    // (with real jobs) while the closure builds the frame, exactly like the
    // bench's timed runs
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"MEDIAN_SEC=${times(1)}%.3f")
    val plan = df.queryExecution.executedPlan.toString
    println("EXCHANGES=" + "Exchange hashpartitioning".r.findAllMatchIn(plan).size)
    println("AQEREADS=" + "AQEShuffleRead".r.findAllMatchIn(plan).size)
    println("BROADCASTS=" + "BroadcastExchange".r.findAllMatchIn(plan).size)
    if (args.contains("--plan")) println(plan)
    spark.stop()
  }
}
