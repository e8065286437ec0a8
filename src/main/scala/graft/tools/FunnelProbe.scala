package graft.tools
import graft._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object FunnelProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.tune(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{EventAnalytics, ExactQuantiles}
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val ev = Tables(spark, dir, "events").withColumn("ts_us", expr("ts_ns div 1000"))
    val steps = Seq(
      "signup" -> (col("event_type") === "signup"),
      "view" -> (col("event_type") === "view"),
      "click" -> (col("event_type") === "click"),
      "purchase" -> (col("event_type") === "purchase"))
    println("events rows: " + ev.count())
    (1 to 2).foreach { i =>
      val lat = time(s"lat_materialize_$i") {
        EventAnalytics.funnelLatencies(ev, "user_id", "ts_us", steps).cache() }
      println("lat rows: " + lat.count())
      val qs = time(s"bisection_$i") {
        ExactQuantiles.lowerQuantilesGrouped(lat, "step", "latency",
          Seq(("p50", 1L, 2L), ("p90", 9L, 10L))) }
      lat.unpersist(blocking = false)
      println(qs.size)
    }
    spark.stop()
  }
}
