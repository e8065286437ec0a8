package graft.tools
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Dev utility: dump ONE SparkEntry query + full oracle_sql.json (fast
  * single-query iteration vs a full Verify run). */
object DumpOne {
  def main(args: Array[String]): Unit = {
    val Array(names, sfDir, outDir) = args
    val spark = graft.GraftSession.tune(SparkSession.builder()
      .master("local[16]").config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val picked = names.split(",").map(_.trim).filter(_.nonEmpty)
    picked.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString } + "\""
    // oracle json filtered to the dumped names, so oracle_check.py runs
    // exactly this subset
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      graft.SparkEntry.oracleSql.filter(kv => picked.contains(kv._1))
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}"))
    spark.stop()
  }
}
