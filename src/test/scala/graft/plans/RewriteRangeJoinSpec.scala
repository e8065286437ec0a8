package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer rule must turn a plain BETWEEN join into a bucketized
  * equi-join (no nested-loop) with identical results, and stay inert without
  * its conf or when an equi-key already exists.
  */
class RewriteRangeJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var prior: Option[SparkSession] = _

  override def beforeAll(): Unit = {
    prior = SparkSession.getDefaultSession
    // the shared TestSpark session has no extensions; build a sibling session
    // (same SparkContext) with ours injected
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = graft.GraftSession.tune(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .withExtensions(new GraftExtensions))
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    prior.foreach { s =>
      SparkSession.setDefaultSession(s)
      SparkSession.setActiveSession(s)
    }
  }

  private def data = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(21)
    val points = (0 until 300).map(i => (i.toLong, rnd.nextInt(5000).toLong))
      .toDF("pid", "x")
    val intervals = (0 until 40).map { i =>
      val lo = rnd.nextInt(5000).toLong
      (i.toLong, lo, lo + rnd.nextInt(300).toLong)
    }.toDF("iid", "lo", "hi")
    (points, intervals)
  }

  test("rewrites BETWEEN join to bucketized equi-join with identical results") {
    val s = spark
    import s.implicits._
    val (points, intervals) = data
    val expect = points.crossJoin(intervals)
      .filter($"x" >= $"lo" && $"x" <= $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet

    spark.conf.set("spark.graft.rangeJoin.bucketWidth", "200")
    try {
      val joined = points.join(intervals, $"x" >= $"lo" && $"x" <= $"hi")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan.take(2000))
      val got = joined.select($"pid", $"iid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, "duplicates emitted")
      assert(got.toSet == expect)
    } finally spark.conf.unset("spark.graft.rangeJoin.bucketWidth")
  }

  test("dirty interval rows (hi < lo, NULL bound) match nothing, no crash") {
    val s = spark
    import s.implicits._
    val (points, intervals) = data
    val dirty = intervals
      .union(Seq((500L, 4000L, 100L)).toDF("iid", "lo", "hi"))
      .union(spark.sql("SELECT 501 AS iid, 10 AS lo, CAST(NULL AS BIGINT) AS hi"))
    val expect = points.crossJoin(intervals)
      .filter($"x" >= $"lo" && $"x" <= $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    spark.conf.set("spark.graft.rangeJoin.bucketWidth", "200")
    try {
      val got = points.join(dirty, $"x" >= $"lo" && $"x" <= $"hi")
        .select($"pid", $"iid").as[(Long, Long)].collect().toSet
      assert(got == expect) // dirty rows contribute nothing, clean rows intact
    } finally spark.conf.unset("spark.graft.rangeJoin.bucketWidth")
  }

  test("inert without the conf") {
    val s = spark
    import s.implicits._
    val (points, intervals) = data
    val plan = points.join(intervals, $"x" >= $"lo" && $"x" <= $"hi")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct"))
  }

  test("inert when an equi-key already exists") {
    val s = spark
    import s.implicits._
    val (points, intervals) = data
    spark.conf.set("spark.graft.rangeJoin.bucketWidth", "200")
    try {
      val withKey = points.withColumn("k", col("pid") % 4)
      val ivalKey = intervals.withColumn("k", col("iid") % 4)
      val plan = withKey.join(ivalKey,
          withKey("k") === ivalKey("k") && $"x" >= $"lo" && $"x" <= $"hi")
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("explode"), plan.take(2000))
    } finally spark.conf.unset("spark.graft.rangeJoin.bucketWidth")
  }
}
