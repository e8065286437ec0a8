package graft.tools

import graft._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev: time the streaming-plane bench in isolation with per-trigger
  * breakdown (Bench.streamingThroughput without the 50 batch queries first).
  * Usage: runMain graft.tools.TimeStream [<sfdir>]
  */
object TimeStream {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.tune(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import java.nio.file.{Files, Paths}
    val segDir = Files.createTempDirectory("graft-bench-segs").toString
    val nSegments = 32
    val ev = Tables(spark, sfDir, "events")
    val nEvents = ev.count()
    ev.select(concat(
        col("event_type"), lit(""),
        lit("{\"before\": null, \"after\": "), col("props"), lit("}")).as("value"))
      .repartition(nSegments)
      .write.mode("overwrite").text(segDir + "/raw")
    val parts = new java.io.File(segDir + "/raw").listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    parts.zipWithIndex.foreach { case (f, i) =>
      Files.move(f.toPath, Paths.get(segDir, s"events.${i + 1}.log"))
    }
    val routes = Seq(
      ("click", "k", "t_all"), ("click", "k", "t_click"),
      ("purchase", "k", "t_all"), ("purchase", "k", "t_purchase"),
      ("signup", "k", "t_signup"),
      ("view", "k", "t_all"), ("view", "k", "t_view"))
    import spark.implicits._
    val routesDf = routes.toDF("table", "column", "target")
    def records = spark.readStream.format("graft-cdc")
      .option("path", segDir)
      .option("maxSegmentsPerTrigger", nSegments / 4)
      .load()
      .select(col("id"),
        split(col("envelope"), "").getItem(0).as("table"),
        split(col("envelope"), "").getItem(1).as("envelope"))

    def runOnce(tag: String): Double = {
      val runCkpt = Files.createTempDirectory("graft-bench-ckpt").toString
      val t0 = System.nanoTime()
      val q = graft.streaming.CdcStream.startWith(records, routesDf,
          maxBatch = 1000, runCkpt, windowMillis = 50L) { (batch: DataFrame, _: Long) =>
        batch.write.format("noop").mode("overwrite").save()
      }
      try q.processAllAvailable() finally {
        val wall = (System.nanoTime() - t0) / 1e9
        q.recentProgress.foreach { p =>
          println(f"  [$tag] batch=${p.batchId} rows=${p.numInputRows} " +
            f"trigger=${p.durationMs.getOrDefault("triggerExecution", -1L)}ms " +
            f"addBatch=${p.durationMs.getOrDefault("addBatch", -1L)}ms " +
            f"getBatch=${p.durationMs.getOrDefault("getBatch", -1L)}ms " +
            f"latestOffset=${p.durationMs.getOrDefault("latestOffset", -1L)}ms " +
            f"queryPlanning=${p.durationMs.getOrDefault("queryPlanning", -1L)}ms " +
            f"commitOffsets=${p.durationMs.getOrDefault("commitOffsets", -1L)}ms " +
            f"walCommit=${p.durationMs.getOrDefault("walCommit", -1L)}ms")
        }
        println(f"  [$tag] wall=$wall%.2fs rate=${nEvents / wall}%.0f ev/s")
        q.stop()
      }
      (System.nanoTime() - t0) / 1e9
    }
    runOnce("warmup")
    val best = (1 to 2).map(i => runOnce(s"run$i")).min
    println(f"STREAM events=$nEvents best=$best%.2fs rate=${nEvents / best}%.0f ev/s")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val best8 = (1 to 2).map(i => runOnce(s"p8run$i")).min
    println(f"STREAM-P8 events=$nEvents best=$best8%.2fs rate=${nEvents / best8}%.0f ev/s")
    spark.stop()
  }
}
