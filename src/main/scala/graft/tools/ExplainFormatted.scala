package graft.tools

import graft._
import org.apache.spark.sql.SparkSession

/** Dev: dump `explain("formatted")` for a set of SparkEntry queries to
  * files — the round-17 plan-evidence artifact (`plans/r17/<q>_<tag>.txt`).
  * Args: <tag> <outDir> <query>[,query...] [sfDir]. One session for all
  * dumps so persisted index fixtures build once.
  */
object ExplainFormatted {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: ExplainFormatted <tag> <outDir> <q1,q2,...> [sfDir]")
    val tag = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      // capture the string form of explain("formatted") (pre-execution:
      // AQE shows isFinalPlan=false — the shape evidence lives in the
      // operator tree, join strategies, and PushedFilters/ReadSchema)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(outDir.resolve(s"${name}_$tag.txt"), txt)
      System.err.println(s"[explain] wrote ${name}_$tag.txt")
    }
    spark.stop()
  }
}
