package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway measurement harness (not committed). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tune(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val o = Tables(spark, sf, "orders")
      val r = o.groupBy(col("o_orderpriority"))
        .agg(expr("approx_percentile(o_totalprice, array(0.25,0.5,0.9), 10000)").as("a"),
          expr("percentile(o_totalprice, array(0.25,0.5,0.9))").as("e"))
        .select(col("o_orderpriority"),
          (abs(col("a")(0) - col("e")(0)) / col("e")(0)).as("e25"),
          (abs(col("a")(1) - col("e")(1)) / col("e")(1)).as("e50"),
          (abs(col("a")(2) - col("e")(2)) / col("e")(2)).as("e90"))
        .collect()
      println(s"=== $sf")
      r.foreach(x => println(f"${x.getString(0)}%-10s e25=${x.getDouble(1)}%.5f e50=${x.getDouble(2)}%.5f e90=${x.getDouble(3)}%.5f"))
    }
    spark.stop()
  }
}
