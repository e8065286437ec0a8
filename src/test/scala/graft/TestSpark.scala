package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession for the whole test JVM (suites share it). */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.tune(SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.host", "127.0.0.1"))
    .getOrCreate()

  val sf0001 = "/root/testdata/sf0.001"
}
