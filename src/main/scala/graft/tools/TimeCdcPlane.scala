package graft.tools

import graft._
import org.apache.spark.sql.SparkSession

/** Dev: time the batch CDC plane (`SparkEntry.entry2` — the
  * cdc_events_per_sec metric's subject) at a given sf dir, cold-storage
  * per run, printing per-run events/s. Usage:
  * runMain graft.tools.TimeCdcPlane [sfdir] [runs]
  */
object TimeCdcPlane {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val spark = GraftSession.tune(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = spark.read.parquet(s"$dir/events.parquet").count()
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.entry2(spark, dir).write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"TIMECDC run $i: $s%.2f s  ${n / s}%.0f ev/s  (n=$n)")
    }
    spark.stop()
  }
}
