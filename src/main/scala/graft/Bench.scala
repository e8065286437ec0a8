package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/session warmup so the first timed query doesn't pay JIT + codegen
    // compilation for everyone (driver runs Bench once per round).
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // noop sink forces full plan execution (count() could short-circuit
    // through scan-only statistics paths).
    // 1 untimed warmup + min of 2 timed runs per query: the first execution
    // pays codegen compilation + JIT (measured 4-7x on formatter-heavy
    // queries) and the container shares cores with the driver, so single-shot
    // timings carry multi-second noise.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def run(): Unit =
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
      run() // warmup
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // CDC-plane throughput (BASELINE.md sanity target: >= 20k events/s for
    // route+dedupe+batch). Rate = input events / wall time of the full plane.
    val throughput = try {
      val nEvents = spark.read.parquet(s"$sfDir/events.parquet").count()
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.entry2(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      nEvents / secs
    } catch { case e: Throwable =>
      System.err.println(s"[bench] throughput failed: ${e.getMessage}"); 0.0
    }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""cdc_events_per_sec":${throughput.round},"sf":"$sfDir"}""")
    spark.stop()
  }
}
