package graft.tools

import graft.{Bench, GraftSession}
import org.apache.spark.sql.SparkSession

/** Dev: run the bench's calibration probe N times on an otherwise idle
  * machine and print each median-of-3 value — the evidence basis for
  * refreshing `bench/calibration.json` when the HOST's steady-state speed
  * has genuinely changed (as opposed to a transient shift, which the
  * in-run probes already catch). Usage: runMain graft.tools.Probe [n]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5)
    val spark = GraftSession.tune(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val xs = (1 to n).map { i =>
      val v = Bench.calibrationProbe(spark)
      println(f"PROBE $i: $v%.4f s")
      v
    }.sorted
    println(f"PROBE median: ${xs(xs.size / 2)}%.4f s (load_before=$load%.2f)")
    spark.stop()
  }
}
