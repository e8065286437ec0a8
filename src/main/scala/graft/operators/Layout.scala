package graft.operators

import graft.functions.{HValue, ZValue}
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

  /** Hilbert curve position of `cols` (same clamping contract as
    * [[zvalue]]). Consecutive Hilbert positions are always ADJACENT cells —
    * the Morton curve's long diagonal jumps at power-of-two boundaries are
    * exactly what widen a file's min/max box — so under the identical
    * range-partition + sort layout pass, Hilbert files carry tighter
    * per-column stats and range predicates prune at least as many files.
    * This is the curve production OPTIMIZE/CLUSTER BY passes prefer for
    * 2+ dimensions; both keys are pure codegen expressions computed
    * in-scan.
    */
  def hilbert(bits: Int, cols: Column*): Column =
    column(HValue(cols.map(expression), bits))

  /** Write `df` as `nFiles` Z-ordered parquet files: range-partition on the
    * curve key (contiguous curve segments per file), sort within each file,
    * drop the key. At cluster scale this is the standard OPTIMIZE/ZORDER
    * layout pass, expressed as plain Spark.
    */
  def zorderWrite(df: DataFrame, bits: Int, zcols: Seq[String], path: String,
                  nFiles: Int): Unit =
    curveWrite(df, zvalue(bits, zcols.map(col): _*), path, nFiles)

  /** [[zorderWrite]] with the Hilbert key — one sort at write time, tighter
    * min/max boxes on every interleaved column at read time.
    */
  def hilbertWrite(df: DataFrame, bits: Int, hcols: Seq[String], path: String,
                   nFiles: Int): Unit =
    curveWrite(df, hilbert(bits, hcols.map(col): _*), path, nFiles)

  private def curveWrite(df: DataFrame, key: Column, path: String,
                         nFiles: Int): Unit =
    df.withColumn("_z", key)
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)

  /** Per-file [min, max] of each audited column — the exact stats parquet
    * skipping consults, read straight from the parquet FOOTERS through the
    * Hadoop FS API: one metadata round-trip per file, no data pages read,
    * and it works on any filesystem Spark can reach (HDFS, S3A, local),
    * not just `java.io.File`. `filesPruned(stats, col, lo, hi)` = how many
    * files a `col BETWEEN lo AND hi` predicate skips under this layout.
    */
  def fileStats(spark: SparkSession, path: String, cols: Seq[String])
      : Seq[(String, Map[String, (Long, Long)])] = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    val files = fs.listStatus(dir)
      .filter { st =>
        val n = st.getPath.getName
        st.isFile && n.endsWith(".parquet") && !n.startsWith("_")
      }
      .sortBy(_.getPath.getName).toSeq
    files.map { st =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromStatus(st, conf))
      try {
        // min/max across all row groups; integral physical types only
        // (the audited layout keys are integral by the zvalue contract)
        val perCol = reader.getFooter.getBlocks.asScala
          .flatMap(_.getColumns.asScala)
          .filter(c => cols.contains(c.getPath.toDotString))
          .groupBy(_.getPath.toDotString)
        st.getPath.toString -> cols.map { c =>
          val chunks = perCol.getOrElse(c,
            throw new IllegalArgumentException(
              s"fileStats: no column chunk stats for '$c' in ${st.getPath}"))
          def asLong(v: Comparable[_]): Long = v match {
            case l: java.lang.Long => l.longValue()
            case i: java.lang.Integer => i.longValue()
            case null => throw new IllegalArgumentException(
              s"fileStats: null min/max for '$c' despite hasNonNullValue")
            case o => throw new IllegalArgumentException(
              s"fileStats: non-integral stats for '$c': ${o.getClass}")
          }
          // a writer may omit statistics, and an all-null column chunk has
          // stats with no values — either way there is no usable min/max
          // and pretending otherwise would mis-prune files
          val usable = chunks.map(_.getStatistics).map { s =>
            if (s == null || s.isEmpty || !s.hasNonNullValue)
              throw new IllegalArgumentException(
                s"fileStats: missing or all-null statistics for '$c' in " +
                  s"${st.getPath}")
            s
          }
          val mins = usable.map(s => asLong(s.genericGetMin()))
          val maxs = usable.map(s => asLong(s.genericGetMax()))
          c -> (mins.min, maxs.max)
        }.toMap
      } finally reader.close()
    }
  }

  def filesPruned(stats: Seq[(String, Map[String, (Long, Long)])],
                  c: String, lo: Long, hi: Long): Int =
    stats.count { case (_, m) =>
      val (mn, mx) = m(c); mx < lo || mn > hi
    }
}
