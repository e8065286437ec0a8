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

  test("hilbert is a true Hilbert curve: bijective, unit-step adjacent (2-D and 3-D)") {
    // exhaustive over the full grid THROUGH the Column/codegen path — any
    // orientation or interleave slip breaks one of the two laws
    val b2 = 5
    val grid2 = for { x <- 0 until (1 << b2); y <- 0 until (1 << b2) }
      yield (x.toLong, y.toLong)
    val got2 = grid2.toDF("x", "y")
      .select($"x", $"y", Layout.hilbert(b2, $"x", $"y").as("h"))
      .as[(Long, Long, Long)].collect()
    assert(got2.map(_._3).sorted.toSeq == (0L until (1L << (2 * b2))),
      "2-D positions must be a bijection onto [0, 4^bits)")
    val byPos2 = got2.map(t => t._3 -> (t._1, t._2)).toMap
    (0L until (1L << (2 * b2)) - 1).foreach { i =>
      val (x1, y1) = byPos2(i); val (x2, y2) = byPos2(i + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"positions $i and ${i + 1} must be adjacent cells")
    }

    val b3 = 3
    val grid3 = for { x <- 0 until (1 << b3); y <- 0 until (1 << b3);
                      z <- 0 until (1 << b3) } yield (x.toLong, y.toLong, z.toLong)
    val got3 = grid3.toDF("x", "y", "z")
      .select($"x", $"y", $"z", Layout.hilbert(b3, $"x", $"y", $"z").as("h"))
      .as[(Long, Long, Long, Long)].collect()
    assert(got3.map(_._4).sorted.toSeq == (0L until (1L << (3 * b3))),
      "3-D positions must be a bijection onto [0, 8^bits)")
    val byPos3 = got3.map(t => t._4 -> (t._1, t._2, t._3)).toMap
    (0L until (1L << (3 * b3)) - 1).foreach { i =>
      val (a1, b1, c1) = byPos3(i); val (a2, b2c, c2) = byPos3(i + 1)
      assert(math.abs(a1 - a2) + math.abs(b1 - b2c) + math.abs(c1 - c2) == 1,
        s"3-D positions $i and ${i + 1} must be adjacent cells")
    }
  }

  test("hilbert clamps out-of-range keys and is null iff any input is null") {
    val df = Seq((Some(-5L), Some(1L << 40)), (None, Some(3L)), (Some(4L), None))
      .toDF("x", "y")
    val got = df.select(Layout.hilbert(16, $"x", $"y")).collect()
    assert(got.map(_.isNullAt(0)).toSeq == Seq(false, true, true))
    val edge = Seq((0L, (1L << 16) - 1L)).toDF("x", "y")
      .select(Layout.hilbert(16, $"x", $"y")).as[Long].head()
    assert(got(0).getLong(0) == edge, "clamping must hit the [0, 2^bits) edges")
    intercept[Exception] {
      df.select(Layout.hilbert(40, $"x", $"y")).collect() // 2×40 > 63
    }
  }

  test("hilbert layout prunes at least as many files as z-order; strictly more off-aligned") {
    // deterministic equal-count contiguous partitioning of the sorted curve
    // keys (what repartitionByRange converges to, minus sampling noise):
    // sum pruned files over the battery of all 8-wide slices on both dims.
    // At 16 files every file of EITHER curve is an aligned 16×16 quadrant
    // (256 = 4^4 positions) and they tie; at 13 files the boxes straddle
    // quadrant boundaries and Morton's power-of-two diagonal jumps widen
    // them where Hilbert's unit steps do not
    val bits = 6; val n = 1 << bits
    val grid = for { x <- 0 until n; y <- 0 until n } yield (x.toLong, y.toLong)
    def prunedTotal(key: (Long, Long) => Long, nFiles: Int): Int = {
      val sorted = grid.sortBy { case (x, y) => key(x, y) }
      val boxes = (0 until nFiles).map { f =>
        val chunk = sorted.slice(
          math.round(f.toDouble * grid.size / nFiles).toInt,
          math.round((f + 1).toDouble * grid.size / nFiles).toInt)
        (chunk.map(_._1).min, chunk.map(_._1).max,
          chunk.map(_._2).min, chunk.map(_._2).max)
      }
      (0 until n by 8).map { lo =>
        val hi = lo + 7
        boxes.count { case (x1, x2, _, _) => x2 < lo || x1 > hi } +
          boxes.count { case (_, _, y1, y2) => y2 < lo || y1 > hi }
      }.sum
    }
    val h: (Long, Long) => Long =
      (x, y) => graft.functions.Kernels.hilbertPos(Array(x, y), bits)
    val z: (Long, Long) => Long =
      (x, y) => graft.functions.Kernels.zpart(x, 0, 2, bits) |
        graft.functions.Kernels.zpart(y, 1, 2, bits)
    for (nFiles <- Seq(7, 10, 12, 13, 16))
      assert(prunedTotal(h, nFiles) >= prunedTotal(z, nFiles),
        s"hilbert must prune >= z-order at $nFiles files")
    assert(prunedTotal(h, 13) > prunedTotal(z, 13),
      "hilbert must prune strictly more at a non-aligned file count")

    // and through the real parquet write path: both dims prune
    val hPath = java.nio.file.Files.createTempDirectory("graft-hilbert").toString
    Layout.hilbertWrite(grid.toDF("x", "y"), bits, Seq("x", "y"), hPath, 16)
    val hStats = Layout.fileStats(spark, hPath, Seq("x", "y"))
    assert(Layout.filesPruned(hStats, "x", 0L, 7L) >= 8)
    assert(Layout.filesPruned(hStats, "y", 0L, 7L) >= 8)
    assert(spark.read.parquet(hPath).select($"x", $"y").as[(Long, Long)]
      .collect().toSet == grid.toSet)
  }
}
