package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // sequential Morton reference: interleave the low `bits` bits of each
  // value (clamped) with stride d
  private def mortonRef(vals: Seq[Long], bits: Int): Long = {
    val d = vals.size
    vals.zipWithIndex.map { case (v, i) =>
      val max = (1L << bits) - 1L
      val c = math.min(math.max(v, 0L), max)
      (0 until bits).map(j => ((c >>> j) & 1L) << (j * d + i)).reduce(_ | _)
    }.reduce(_ | _)
  }

  test("zvalue equals the sequential Morton reference (2-D and 3-D, clamping)") {
    val rnd = new scala.util.Random(7)
    val rows2 = (1 to 200).map { _ =>
      (rnd.nextInt(1 << 17).toLong - 1000L, rnd.nextInt(1 << 17).toLong - 1000L)
    } :+ ((-5L, (1L << 40))) // clamp both edges
    val got2 = rows2.toDF("x", "y")
      .select(Layout.zvalue(16, $"x", $"y").as("z")).as[Long].collect()
    assert(got2.toSeq == rows2.map { case (x, y) => mortonRef(Seq(x, y), 16) })

    val rows3 = (1 to 100).map(_ =>
      (rnd.nextInt(2000).toLong, rnd.nextInt(2000).toLong, rnd.nextInt(2000).toLong))
    val got3 = rows3.toDF("x", "y", "w")
      .select(Layout.zvalue(10, $"x", $"y", $"w").as("z")).as[Long].collect()
    assert(got3.toSeq ==
      rows3.map { case (x, y, w) => mortonRef(Seq(x, y, w), 10) })
  }

  test("zvalue is null iff any input is null; rejects over-wide configs") {
    val df = Seq((Some(1L), Some(2L)), (None, Some(3L)), (Some(4L), None))
      .toDF("x", "y")
    val got = df.select(Layout.zvalue(16, $"x", $"y")).collect().map(_.isNullAt(0))
    assert(got.toSeq == Seq(false, true, true))
    intercept[Exception] {
      df.select(Layout.zvalue(40, $"x", $"y")).collect() // 2×40 > 63
    }
  }

  test("z-ordered files prune BOTH dimensions; a linear sort prunes only its leading one") {
    // 64×64 uniform grid, one row per cell — every (x, y) slice is exactly
    // representable, so pruning counts are deterministic
    val grid = for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
    val zPath = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val linPath = java.nio.file.Files.createTempDirectory("graft-linear").toString
    Layout.zorderWrite(df, 6, Seq("x", "y"), zPath, 16)
    // linear layout: same file count, sorted by x alone
    df.repartitionByRange(16, $"x").sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linPath)

    val zStats = Layout.fileStats(spark, zPath, Seq("x", "y"))
    val linStats = Layout.fileStats(spark, linPath, Seq("x", "y"))
    assert(zStats.size == 16 && linStats.size == 16)

    // a 1/8-of-range slice on each dimension
    val zPrunedX = Layout.filesPruned(zStats, "x", 0L, 7L)
    val zPrunedY = Layout.filesPruned(zStats, "y", 0L, 7L)
    val linPrunedX = Layout.filesPruned(linStats, "x", 0L, 7L)
    val linPrunedY = Layout.filesPruned(linStats, "y", 0L, 7L)
    // leading-column pruning: both layouts prune x slices well
    assert(linPrunedX >= 12, s"linear layout should prune x, got $linPrunedX")
    assert(zPrunedX >= 8, s"z layout should prune x, got $zPrunedX")
    // the payoff: z prunes y too; the linear layout cannot (every file
    // spans the full y range)
    assert(linPrunedY == 0, s"linear layout cannot prune y, got $linPrunedY")
    assert(zPrunedY >= 8, s"z layout must prune y, got $zPrunedY")
    // correctness: both layouts hold the same rows
    assert(spark.read.parquet(zPath).count() == grid.size)
    assert(spark.read.parquet(zPath).select($"x", $"y").as[(Long, Long)]
      .collect().toSet == grid.toSet)
  }
}
