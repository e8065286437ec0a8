package graft.tools

import graft._
import org.apache.spark.sql.SparkSession

/** Dev: time named queries (warmup + median of 3, noop sink) at a given sf
  * dir. Usage: runMain graft.tools.TimeQuery <query>... [-- <sfdir>]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val (names, rest) = args.span(_ != "--")
    val dir = rest.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    // same SPARK_GRAFT_CPUS contract as Bench (default 4 there): timings
    // are only comparable to bench_full.json at the same parallelism —
    // these small-sf queries are stage-scheduling-bound, so local[32]
    // reads ~1.4x local[4] on the identical plan
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def run(): Unit =
        fn(spark, dir).write.format("noop").mode("overwrite").save()
      run() // warmup
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"TIME $name ${times(1)}%.2f s (min ${times.head}%.2f max ${times.last}%.2f)")
    }
    spark.stop()
  }
}
