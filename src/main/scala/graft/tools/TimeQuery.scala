package graft.tools
import org.apache.spark.sql.SparkSession
/** Debug: time one SparkEntry query standalone with Bench's methodology
  * (1 untimed warmup, then N timed noop-sink runs) — for adjudicating a
  * flagged bench entry outside the full suite. Args: name [sfDir] [runs].
  */
object TimeQuery extends App {
  // CLI contract changed in round 14 (was multi-query with "-- <sfdir>");
  // fail loudly with usage instead of timing the wrong thing
  if (args.isEmpty || args(0).startsWith("-") ||
      !graft.SparkEntry.queries.contains(args(0))) {
    System.err.println("usage: TimeQuery <query-name> [sfDir] [runs]")
    if (args.nonEmpty && !args(0).startsWith("-"))
      System.err.println(s"unknown query '${args(0)}'")
    sys.exit(2)
  }
  val name = args(0)
  val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
  val runs = if (args.length > 2) args(2).toInt else 5
  val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
  val spark = graft.GraftSession.tune(SparkSession.builder()
    .master(s"local[$cpus]")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.ui.enabled", "false"))
    .getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
  val fn = graft.SparkEntry.queries(name)
  def run(): Double = {
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }
  println(f"TIMEQ warmup ${run()}%.3f")
  val xs = (1 to runs).map(_ => run())
  println("TIMEQ runs " + xs.map(x => f"$x%.3f").mkString(" "))
  println(f"TIMEQ median ${xs.sorted.apply(xs.size / 2)}%.3f")
  spark.stop()
}
