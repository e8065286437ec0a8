package graft.operators

import graft.functions.ZValue
import org.apache.spark.sql.GraftBridge.{column, expression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Multi-dimensional data layout for scan pruning — the 100 TB lever that
  * costs one sort at write time and pays on every read after.
  *
  * Parquet skipping works off per-file / per-row-group min-max stats: a
  * predicate prunes a file iff the file's [min, max] range on that column
  * misses it. A linear sort gives tight ranges on the LEADING sort column
  * only; sorting by the Morton curve position ([[graft.functions.ZValue]])
  * gives moderately tight ranges on EVERY interleaved column, so slices by
  * any of them (source AND date, partkey AND suppkey) prune. The curve key
  * is a pure codegen expression computed in-scan; the write is one range
  * exchange + per-file sort — no extra pass over the data.
  */
object Layout {

  /** Morton curve position of `cols` (integral, non-negative; values are
    * clamped into [0, 2^bits)). `cols.size * bits` must fit in 63.
    */
  def zvalue(bits: Int, cols: Column*): Column =
    column(ZValue(cols.map(expression), bits))

  /** Write `df` as `nFiles` Z-ordered parquet files: range-partition on the
    * curve key (contiguous curve segments per file), sort within each file,
    * drop the key. At cluster scale this is the standard OPTIMIZE/ZORDER
    * layout pass, expressed as plain Spark.
    */
  def zorderWrite(df: DataFrame, bits: Int, zcols: Seq[String], path: String,
                  nFiles: Int): Unit =
    df.withColumn("_z", zvalue(bits, zcols.map(col): _*))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)

  /** Per-file [min, max] of each audited column — the exact stats parquet
    * skipping consults, read back through the public API (one tiny agg per
    * file). `filesPruned(stats, col, lo, hi)` = how many files a
    * `col BETWEEN lo AND hi` predicate skips under this layout.
    */
  def fileStats(spark: SparkSession, path: String, cols: Seq[String])
      : Seq[(String, Map[String, (Long, Long)])] = {
    val fs = new java.io.File(path).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      .map(_.getAbsolutePath).sorted.toSeq
    fs.map { f =>
      val aggs = cols.flatMap(c => Seq(
        min(col(c)).cast("long").as(s"min_$c"), max(col(c)).cast("long").as(s"max_$c")))
      val r = spark.read.parquet(f).agg(aggs.head, aggs.tail: _*).head()
      f -> cols.zipWithIndex.map { case (c, i) =>
        c -> (r.getLong(2 * i), r.getLong(2 * i + 1)) }.toMap
    }
  }

  def filesPruned(stats: Seq[(String, Map[String, (Long, Long)])],
                  c: String, lo: Long, hi: Long): Int =
    stats.count { case (_, m) =>
      val (mn, mx) = m(c); mx < lo || mn > hi
    }
}
