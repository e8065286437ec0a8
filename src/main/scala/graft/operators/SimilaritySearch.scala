package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale model (1000 executors / 100 TB of vectors):
  *   - [[bruteForceTopK]]: the query set is broadcast (queries are small by
  *     assumption); each corpus partition scores its rows map-side against
  *     every query — one pass over the corpus, no corpus shuffle; the only
  *     shuffle is the per-query top-k reduction over (queries × k) rows.
  *   - [[lshTopK]]: corpus is pre-bucketed by a random-hyperplane sign sketch
  *     (the IVF-style scale path): each query probes only its own bucket plus
  *     `probes` nearest buckets by sketch hamming distance, turning the scan
  *     into a bucket-pruned join. Recall is tunable via planes/probes.
  */
object SimilaritySearch {

  /** Exact top-k neighbors for each query vector (cross score + windowed
    * top-k with deterministic id tie-break).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorFunctions.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** LSH-bucketed ANN with OR-amplification: `tables` independent
    * hyperplane sketches (seeded per table); a corpus row is a candidate if
    * it collides with the query in ANY table, where "collides" means equal
    * sketch or within one of the `probes` single-bit flips (multi-probe).
    * Candidates are deduped on (query, neighbor) BEFORE exact-cosine scoring
    * so cross-table duplicates cost one join row, not one cosine each.
    *
    * Recall/cost dial: per-table match prob for angle θ is (1-θ/π)^planes —
    * OR over tables lifts it to 1-(1-p)^tables while scan cost stays
    * ~tables/2^planes of the corpus per probe. The index (table, bucket,
    * id) is `tables`× the id column — the classic L-table LSH size tradeoff,
    * all map-side; vectors never ride through the candidate join.
    */
  /** Per-table sketches as struct(t, bucket); compile-time unrolled.
    * md5Tag switches to the md5-derived plane family ("<tag><t>" per table)
    * so a SQL oracle can rebuild the exact buckets.
    */
  private def lshSketches(v: org.apache.spark.sql.Column, planes: Int,
                          tables: Int, seed: Long,
                          md5Tag: Option[String]): org.apache.spark.sql.Column =
    array((0 until tables).map { t =>
      struct(lit(t).as("t"), (md5Tag match {
        case Some(tag) => VectorFunctions.hyperplaneSketchMd5(v, planes, s"$tag$t")
        case None => VectorFunctions.hyperplaneSketch(v, planes, seed + t * 7919L)
      }).as("b"))
    }: _*)

  /** Per-(table, bucket) occupancy of the LSH index over `corpus` — the
    * candidate-COST metric for [[lshTopK]]: each probe of (t, bucket) joins
    * against exactly that bucket's rows, so `max(n)` bounds per-probe work
    * and `sum over probed buckets` is the candidate volume. A healthy
    * hyperplane family keeps occupancy near |corpus| / 2^planes; a
    * degenerate family (constant sketch — e.g. zero vectors, or collinear
    * planes) collapses the corpus into one bucket and silently turns the
    * "pruned" join quadratic. SimilaritySpec asserts the bound in CI; run
    * this before trusting a new plane family or corpus at scale.
    */
  def lshBucketStats(corpus: DataFrame, idCol: String, vecCol: String,
                     planes: Int, tables: Int = 1, seed: Long = 42L,
                     md5Tag: Option[String] = None): DataFrame =
    corpus.select(col(idCol).as("id"),
        explode(lshSketches(col(vecCol), planes, tables, seed, md5Tag)).as("s"))
      .groupBy(col("s.t").as("t"), col("s.b").as("bucket"))
      .agg(count(lit(1)).as("n"))

  /** Per-cell occupancy of the md5-seeded coarse quantizer — the
    * [[lshBucketStats]] counterpart for the IVF/SemDeDup cell family
    * ([[Dedup.semanticDedupPairs]], [[CorpusOps.decontaminateSemantic]],
    * `ivfTopKSeeded`): every within-cell candidate stage costs Σ|cell|²,
    * so occupancy is the quadratic-blowup early-warning. Returns
    * (cell, n) for every non-empty cell.
    */
  def cellOccupancyStats(corpus: DataFrame, idCol: String, vecCol: String,
                         nlist: Int): DataFrame = {
    val (flat, norms, dim) =
      seedCentroids(corpus, idCol, vecCol, nlist, "cellOccupancyStats")
    corpus.select(
        VectorFunctions.nearestCentroid(col(vecCol), flat, norms, dim).as("cell"))
      .groupBy("cell").agg(count(lit(1)).as("n"))
  }

  /** One-row occupancy AUDIT over [[cellOccupancyStats]] — the "raise
    * nlist" guard for operators that pin a fixed cell count: a quantizer
    * sized for last year's corpus silently goes quadratic as the corpus
    * grows (measured: the nlist=16 oracle pin made `dedup_semantic` 67× at
    * 100× data — cells grow linearly with rows when nlist stands still).
    * Run this beside any scheduled semantic-dedup/decontamination job and
    * alert on `degenerate` or `suggested_nlist > nlist`.
    *
    * All columns are integer-exact (no floats): `degenerate` is the integer
    * cross-multiplied form of "max cell share > 4× the ideal 1/nlist", and
    * `suggested_nlist` is the smallest power of two giving at most
    * `targetCellRows` mean rows per cell — both bit-replayable by a SQL
    * oracle. Null `suggested_nlist` means the corpus exceeds 2^30 cells'
    * worth of target rows (not a realistic tier; raise targetCellRows).
    */
  def cellOccupancyAudit(corpus: DataFrame, idCol: String, vecCol: String,
                         nlist: Int, targetCellRows: Long = 256L): DataFrame = {
    require(targetCellRows >= 1, "targetCellRows must be >= 1")
    val powers = array((0 to 30).map(k => lit(1L << k)): _*)
    cellOccupancyStats(corpus, idCol, vecCol, nlist)
      .agg(sum(col("n")).as("n_rows"),
        count(lit(1)).as("n_cells_used"),
        max(col("n")).as("max_cell_rows"))
      .select(lit(nlist).cast("long").as("nlist"),
        col("n_rows").cast("long").as("n_rows"),
        col("n_cells_used").cast("long").as("n_cells_used"),
        col("max_cell_rows").cast("long").as("max_cell_rows"),
        (col("max_cell_rows") * lit(nlist.toLong) >
          col("n_rows") * lit(4L)).as("degenerate"),
        array_min(filter(powers,
          p => p * lit(targetCellRows) >= col("n_rows")))
          .as("suggested_nlist"))
  }

  /** Resolve a caller-supplied nlist for the quantizer-family operators
    * ([[Dedup.semanticDedupPairs]], [[CorpusOps.decontaminateSemantic]],
    * [[clusterPurity]]): a positive value passes through unchanged — the
    * caller's pin, which oracle queries rely on for bit-replayability — and
    * `nlist == 0` selects AUTO mode: derive the cell count the same way
    * [[cellOccupancyAudit]]'s `suggested_nlist` does (smallest power of two
    * giving at most `targetCellRows` mean rows per cell), at the cost of
    * one bounded extra pass (a count of the corpus). This closes the
    * "corpus outgrew the pin" failure the audit flags: a quantizer sized
    * for last year's corpus silently goes quadratic as rows grow (measured
    * at 100× data: `semanticDedupPairs` pinned at 16 = 24.6 s vs the
    * suggested 1024 = 4.9 s), and auto mode re-derives per run so the cell
    * count tracks the corpus. Note the recall boundary moves with nlist
    * (blocking is quantizer-dependent — the SemDeDup tradeoff); pin when a
    * stable pair set matters more than cost.
    */
  private[graft] def resolveNlist(corpus: DataFrame, nlist: Int,
                                  targetCellRows: Long = 256L): Int = {
    require(nlist >= 0, "nlist must be > 0 (pinned) or 0 (auto)")
    require(targetCellRows >= 1, "targetCellRows must be >= 1")
    if (nlist > 0) nlist
    else {
      val n = corpus.count()
      var p = 1L
      while (p * targetCellRows < n && p < (1L << 30)) p <<= 1
      // mirror cellOccupancyAudit, whose suggested_nlist goes NULL past the
      // 2^30 cap: silently returning a saturated 2^30 here would diverge
      // from the documented "derives the audit's suggestion" law exactly at
      // the corpus size where occupancy starts drifting — fail loudly with
      // the audit's own remedy instead
      require(p * targetCellRows >= n,
        s"resolveNlist: corpus rows ($n) exceed 2^30 cells x targetCellRows " +
          s"($targetCellRows) — the occupancy audit's suggested_nlist is NULL " +
          "at this size; raise targetCellRows or pin nlist explicitly")
      p.toInt
    }
  }

  /** Persist the LSH index as a bucketed+sorted table so the corpus pays
    * its sketch pass and shuffle ONCE, amortized over every later query
    * batch — the 100 TB serving shape (an index over 100 TB of vectors is
    * rebuilt nightly, queried thousands of times).
    *
    * Index rows are (t, bucket, neighbor_id, cv): the corpus VECTOR rides
    * in the index (storage = `tables`× the vector column — the classic
    * L-table LSH size tradeoff), so query-time candidate scoring needs no
    * second join against the corpus. The table is `bucketBy(bucket)`:
    * a query batch equi-joining on (t, bucket) plans with NO Exchange on
    * the index side — only the (small) probe side shuffles; a
    * broadcast-sized probe side plans with no Exchange at all.
    *
    * The caller must pass the SAME (planes, tables, seed/md5Tag) family to
    * [[queryLshIndex]] — sketch params are the index's identity.
    */
  /** Orphan-safe bucketed managed-table write shared by the index builders.
    * Overwrite mode must survive an ORPHANED location: a previous process's
    * managed table whose (ephemeral) catalog died with it leaves the
    * warehouse dir behind, and saveAsTable refuses to create over it.
    * Buckets on ALL the given keys: Spark only elides the index-side
    * Exchange when the bucket keys equal the join keys (all-cluster-keys
    * rule).
    */
  private[operators] def saveBucketedTable(df: DataFrame, table: String,
                                           bucketCols: Seq[String], nBuckets: Int,
                                           mode: org.apache.spark.sql.SaveMode): Unit = {
    require(table.matches("[A-Za-z0-9_]+"), s"bad index table name '$table'")
    val spark = df.sparkSession
    if (mode == org.apache.spark.sql.SaveMode.Overwrite)
      dropTableAndOrphan(spark, table)
    df.write.mode(mode)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet").saveAsTable(table)
  }

  def buildLshIndex(corpus: DataFrame, idCol: String, vecCol: String,
                    table: String, planes: Int, tables: Int = 1,
                    seed: Long = 42L, md5Tag: Option[String] = None,
                    nBuckets: Int = 8): Unit = {
    require(planes <= 64 && tables >= 1)
    saveBucketedTable(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
          explode(lshSketches(col(vecCol), planes, tables, seed, md5Tag)).as("s"))
        .select(col("s.t").as("t"), col("s.b").as("bucket"),
          col("neighbor_id"), col("cv")),
      table, Seq("t", "bucket"), nBuckets,
      org.apache.spark.sql.SaveMode.Overwrite)
  }

  /** Incremental index maintenance — the daily 100 TB operation: append a
    * delta of NEW documents to a [[buildLshIndex]] table without rebuilding
    * the corpus's index. Only the delta pays a sketch pass + bucketed write
    * (Spark honors the table's bucket spec on append, so later queries
    * still read every bucket pre-partitioned). Same (planes, tables,
    * seed/md5Tag, nBuckets) family as the build — sketch params are the
    * index's identity. Caller owns delta/corpus disjointness (ids already
    * indexed would duplicate candidates).
    */
  def insertLshIndex(delta: DataFrame, idCol: String, vecCol: String,
                     table: String, planes: Int, tables: Int = 1,
                     seed: Long = 42L, md5Tag: Option[String] = None,
                     nBuckets: Int = 8): Unit = {
    require(planes <= 64 && tables >= 1)
    saveBucketedTable(
      delta.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
          explode(lshSketches(col(vecCol), planes, tables, seed, md5Tag)).as("s"))
        .select(col("s.t").as("t"), col("s.b").as("bucket"),
          col("neighbor_id"), col("cv")),
      table, Seq("t", "bucket"), nBuckets,
      org.apache.spark.sql.SaveMode.Append)
  }

  /** Persisted IVF index — the corpus pays the quantizer derivation and its
    * cell-assignment pass ONCE; the bucketed (cell) layout makes the
    * query-time candidate join Exchange-free on the index side, and the
    * vector rides the row (1× storage — cells partition the corpus, unlike
    * the L-table LSH index).
    *
    * The quantizer (the nlist md5-smallest corpus rows, in pick order) is
    * persisted alongside the cells as `<table>_quantizer` — the quantizer
    * is part of the index artifact, exactly as a FAISS index file carries
    * its trained quantizer. That is what makes [[insertIvfIndex]] sound:
    * the md5-seeded quantizer is DATA-DEPENDENT, so re-deriving it from
    * base+delta rows would silently shift the centroid set away from the
    * stored cell assignments; freezing it at build time (FAISS
    * `add`-with-fixed-centroids, standard practice) lets deltas append
    * with ONE map-side assignment pass. A retrain (quality refresh after
    * heavy drift) is a rebuild — that part of the LSH contrast stands:
    * LSH's data-independent planes never need one.
    */
  def buildIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
                    table: String, nlist: Int, nBuckets: Int = 8): Unit = {
    val spark = corpus.sparkSession
    val picked = pickCentroidRows(corpus, idCol, vecCol, nlist, "buildIvfIndex")
    val (flat, norms, dim) = packCentroids(picked, "buildIvfIndex")
    // quantizer table: (pos, id, v) in md5-pick order — tiny (nlist rows),
    // written first so a crash between the two writes leaves a refreshable
    // quantizer rather than an index without one
    import spark.implicits._
    val qtab = quantizerTable(table)
    dropTableAndOrphan(spark, qtab)
    picked.zipWithIndex
      .map { case (r, i) => (i, r.getString(0), r.getSeq[Float](1)) }
      .toSeq.toDF("pos", "id", "v")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet").saveAsTable(qtab)
    saveBucketedTable(
      corpus.select(
        VectorFunctions.nearestCentroid(col(vecCol), flat, norms, dim).as("cell"),
        col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
      table, Seq("cell"), nBuckets,
      org.apache.spark.sql.SaveMode.Overwrite)
    // build-time distribution snapshot (one scan of the fresh index): the
    // reference state the drift audit compares against. Written LAST — a
    // crash before this line leaves a queryable index whose audit fails
    // loudly ("no build stats") rather than silently comparing to nothing.
    dropTableAndOrphan(spark, buildStatsTable(table))
    perCellStats(spark, table)
      .withColumnRenamed("n", "n_build")
      .withColumnRenamed("poor", "poor_build")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet").saveAsTable(buildStatsTable(table))
  }

  private def quantizerTable(table: String): String = s"${table}_quantizer"
  private def buildStatsTable(table: String): String = s"${table}_buildstats"

  /** The build-time (cell, n_build, poor_build) snapshot of a persisted IVF
    * index — public so callers can e.g. locate the busiest cell without
    * re-aggregating the index.
    */
  def ivfBuildStats(spark: org.apache.spark.sql.SparkSession,
                    table: String): DataFrame =
    spark.table(buildStatsTable(table))

  /** One aggregate pass over a persisted IVF table: per cell, the row count
    * and the count of rows whose dot product with their own centroid is
    * <= 0 ("poor fit": the assigned centroid is not even positively
    * correlated — a SIGN, so the IEEE comparison is replay-stable in a way
    * a magnitude threshold would not be). Centroids ride a broadcast of
    * the nlist-row quantizer table.
    */
  private def perCellStats(spark: org.apache.spark.sql.SparkSession,
                           table: String): DataFrame = {
    val cents = spark.table(quantizerTable(table))
      .select(col("pos").as("cell"), col("v").as("_cent"))
    spark.table(table)
      .join(broadcast(cents), "cell")
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"),
        sum(when(VectorFunctions.dot(col("cv"), col("_cent")) <= 0.0, 1L)
          .otherwise(0L)).as("poor"))
  }

  /** IVF drift audit — the signal that says "the frozen quantizer has gone
    * stale, rebuild now". Compares the CURRENT per-cell occupancy and
    * poor-fit distribution of a [[buildIvfIndex]]+[[insertIvfIndex]] table
    * against the build-time snapshot stored with the index:
    *
    *   share_shift_ppm = | (n_now·10⁶) div total_now − (n_build·10⁶) div
    *   total_build | — the cell's occupancy-share movement in ppm, exact
    *   integer arithmetic (two floor-divides and a subtraction, replayable
    *   by any SQL engine; floors taken BEFORE subtracting keeps every term
    *   within long range up to ~9·10¹² index rows).
    *
    * A cell is `drifted` when its share moved more than
    * `shiftPpmThreshold` (default 2 percentage points). Deltas only ever
    * ADD rows, so drift here means the incoming distribution no longer
    * matches the build distribution — exactly the condition under which
    * FAISS-style add-with-frozen-centroids degrades (new mass crowds into
    * few cells: nprobe recall drops, cell scans skew).
    *
    * Cost: one aggregate scan of the index + two bounded collects (the
    * nlist-row stats frames); the audit output is nlist rows.
    */
  def auditIvfIndex(spark: org.apache.spark.sql.SparkSession, table: String,
                    shiftPpmThreshold: Long = 20000L): DataFrame = {
    val btab = buildStatsTable(table)
    require(spark.catalog.tableExists(btab),
      s"auditIvfIndex: no build stats for '$table' — (re)build the index " +
        "with this version first")
    val bstats = spark.table(btab)
    val totalBuild = bstats.agg(sum(col("n_build"))).collect()(0).getLong(0)
    val totalNow = spark.table(table).count()
    require(totalBuild > 0 && totalNow > 0, "empty index")
    // FULL OUTER on cell, not inner: a cell empty at build time (no n_build
    // row) that gained delta rows is exactly the drift condition this audit
    // exists to flag — an inner join would silently drop it. Coalesce both
    // sides to 0 so a one-sided cell surfaces (and, with share 0 at build,
    // trivially trips the threshold once it carries real mass).
    bstats.join(perCellStats(spark, table)
        .withColumnRenamed("n", "n_now").withColumnRenamed("poor", "poor_now"),
        Seq("cell"), "full_outer")
      .select(col("cell").cast("long").as("cell"),
        coalesce(col("n_build"), lit(0L)).as("n_build"),
        coalesce(col("n_now"), lit(0L)).as("n_now"),
        coalesce(col("poor_build"), lit(0L)).as("poor_build"),
        coalesce(col("poor_now"), lit(0L)).as("poor_now"))
      .withColumn("share_shift_ppm", abs(
        expr(s"(n_now * 1000000L) div ${totalNow}L") -
          expr(s"(n_build * 1000000L) div ${totalBuild}L")))
      .withColumn("drifted",
        (col("share_shift_ppm") > shiftPpmThreshold).cast("long"))
  }

  /** Drop the table AND its (possibly orphaned) managed location — a dead
    * ephemeral catalog leaves the warehouse dir behind, and saveAsTable
    * refuses to create over it.
    */
  private[operators] def dropTableAndOrphan(
      spark: org.apache.spark.sql.SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      table.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Incremental IVF maintenance (FAISS-style add-with-fixed-centroids):
    * assign ONLY the delta against the index's frozen quantizer and append
    * to the cell-bucketed table (Spark validates the existing bucket spec
    * on append). One map-side pass over the delta — the base corpus is
    * never touched. Caller owns delta/corpus disjointness, as with
    * [[insertLshIndex]].
    */
  def insertIvfIndex(delta: DataFrame, idCol: String, vecCol: String,
                     table: String, nlist: Int, nBuckets: Int = 8): Unit = {
    val spark = delta.sparkSession
    require(spark.catalog.tableExists(quantizerTable(table)),
      s"insertIvfIndex: no quantizer table for '$table' — build first")
    val (flat, norms, dim) = loadQuantizer(spark, table, nlist)
    saveBucketedTable(
      delta.select(
        VectorFunctions.nearestCentroid(col(vecCol), flat, norms, dim).as("cell"),
        col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
      table, Seq("cell"), nBuckets,
      org.apache.spark.sql.SaveMode.Append)
  }

  private def loadQuantizer(spark: org.apache.spark.sql.SparkSession,
                            table: String, nlist: Int)
      : (Array[Double], Array[Double], Int) = {
    val rows = spark.table(quantizerTable(table))
      .orderBy(col("pos")).select(col("id"), col("v")).collect()
    require(rows.length == nlist,
      s"quantizer for '$table' has ${rows.length} centroids, expected $nlist")
    packCentroids(rows, s"loadQuantizer($table)")
  }

  /** Query a [[buildIvfIndex]] table: same semantics and byte-identical
    * output as [[ivfTopKSeeded]]. The quantizer comes from the persisted
    * `<table>_quantizer` (authoritative once deltas have been appended);
    * for a pre-quantizer-era index it falls back to re-deriving the
    * md5-smallest pick from the index rows — identical for a build-only
    * index, which carries exactly the corpus. The probe side broadcasts;
    * the corpus side is one pre-assigned, pre-bucketed scan with no sketch
    * pass and no Exchange.
    */
  def queryIvfIndex(spark: org.apache.spark.sql.SparkSession, table: String,
                    queries: DataFrame, idCol: String, vecCol: String,
                    k: Int, nlist: Int, nprobe: Int): DataFrame = {
    val idx = spark.table(table)
    val (flat, norms, dim) =
      if (spark.catalog.tableExists(quantizerTable(table)))
        loadQuantizer(spark, table, nlist)
      else seedCentroids(idx, "neighbor_id", "cv", nlist, "queryIvfIndex")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("cell",
        explode(VectorFunctions.probeCentroids(col("qv"), flat, norms, dim, nprobe)))
    val scored = idx.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorFunctions.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** Query a [[buildLshIndex]] table: same candidate semantics and output
    * as [[lshTopK]] (multi-probe on the first `probes` planes, cross-table
    * OR-amplification, exact-cosine rank) — byte-identical results, but the
    * corpus side is a pre-sketched, pre-bucketed scan: no per-query sketch
    * pass over the corpus, no corpus-side Exchange, no vector re-join.
    */
  def queryLshIndex(spark: org.apache.spark.sql.SparkSession, table: String,
                    queries: DataFrame, idCol: String, vecCol: String,
                    k: Int, planes: Int, probes: Int, tables: Int = 1,
                    seed: Long = 42L, md5Tag: Option[String] = None): DataFrame = {
    require(planes <= 64 && tables >= 1 && probes <= planes)
    val idx = spark.table(table)
    val masks = (0L +: (0 until probes).map(1L << _)).toArray
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        explode(lshSketches(col(vecCol), planes, tables, seed, md5Tag)).as("s"))
      .select(col("query_id"), col("qv"), col("s.t").as("t"),
        explode(transform(lit(masks), m => col("s.b").bitwiseXOR(m))).as("bucket"))
    // dedupe cross-table/cross-probe candidates BEFORE cosine scoring;
    // qv/cv are functionally determined by the group key, `first` is exact
    val cands = idx.join(broadcast(q), Seq("t", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(first(col("qv")).as("qv"), first(col("cv")).as("cv"))
    val scored = cands.withColumn("cosine",
      VectorFunctions.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, planes: Int, probes: Int,
              tables: Int = 1, seed: Long = 42L,
              md5Tag: Option[String] = None): DataFrame = {
    require(planes <= 64 && tables >= 1 && probes <= planes)
    def sketches(v: org.apache.spark.sql.Column) =
      lshSketches(v, planes, tables, seed, md5Tag)
    val c = corpus.select(col(idCol).as("neighbor_id"),
        explode(sketches(col(vecCol))).as("s"))
      .select(col("neighbor_id"), col("s.t"), col("s.b").as("bucket"))
    // probe masks: the identity plus single-bit flips of the first `probes` planes
    val masks = (0L +: (0 until probes).map(1L << _)).toArray
    val q = queries.select(col(idCol).as("query_id"),
        explode(sketches(col(vecCol))).as("s"))
      .select(col("query_id"), col("s.t"),
        explode(transform(lit(masks), m => col("s.b").bitwiseXOR(m))).as("bucket"))
    val cands = c.join(broadcast(q), Seq("t", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = cands.join(cv, "neighbor_id").join(broadcast(qv), "query_id")
      .withColumn("cosine", VectorFunctions.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** kNN majority-vote labeling over the LSH candidate path — the
    * auto-labeling / label-propagation primitive of a curation pipeline
    * (label unlabeled documents from their nearest labeled neighbors).
    * Neighbors come from [[lshTopK]] (self excluded, so running it on the
    * labeled corpus itself is leave-one-out evaluation); the prediction is
    * the modal neighbor label, ties to the smallest label — integer-exact,
    * oracle-replayable.
    *
    * Scale shape: the vote aggregate runs over ≤ k·|queries| bounded rows;
    * everything corpus-sized is inside the LSH path's bucket pruning.
    *
    * @return (query_id, pred_label, votes, n_neighbors)
    */
  def knnClassify(queries: DataFrame, corpus: DataFrame, idCol: String,
                  vecCol: String, labelCol: String, k: Int, planes: Int,
                  probes: Int, tables: Int = 1, seed: Long = 42L,
                  md5Tag: Option[String] = None): DataFrame = {
    val nn = lshTopK(queries, corpus, idCol, vecCol, k, planes, probes,
      tables, seed, md5Tag)
    val labels = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("nbr_label"))
    val votes = nn.join(labels, "neighbor_id")
      .groupBy(col("query_id"), col("nbr_label"))
      .agg(count(lit(1)).as("votes"))
    val byQuery = Window.partitionBy(col("query_id"))
    val rank = byQuery.orderBy(col("votes").desc, col("nbr_label"))
    votes.withColumn("n_neighbors", sum(col("votes")).over(byQuery))
      .withColumn("rn", row_number().over(rank))
      .filter(col("rn") === 1)
      .select(col("query_id"), col("nbr_label").as("pred_label"),
        col("votes"), col("n_neighbors"))
  }

  /** Per-cell label purity of the md5-seeded coarse quantizer — the
    * embedding-quality audit a curation pipeline runs before trusting
    * cluster-level decisions (SemDeDup pruning, cluster-balanced sampling):
    * a cell whose members disagree on label is a cell whose "semantic
    * duplicates" aren't. Majority label ties to the smallest label.
    *
    * Scale shape: cell assignment is a codegen map-side expression over one
    * corpus pass; the vote table is bounded by nlist × |labels| (≪ corpus),
    * so both windows run over bounded groups.
    *
    * `nlist = 0` selects auto mode (see [[resolveNlist]]): the cell count
    * re-derives from the corpus size, so a grown corpus cannot silently
    * degrade the audit's resolution.
    *
    * @return (cell, n_vecs, maj_label, maj_votes) one row per non-empty cell
    */
  def clusterPurity(emb: DataFrame, idCol: String, vecCol: String,
                    labelCol: String, nlist: Int): DataFrame = {
    val nl = resolveNlist(emb, nlist)
    val (flat, norms, dim) =
      seedCentroids(emb, idCol, vecCol, nl, "clusterPurity")
    val assigned = emb.select(col(labelCol).as("label"),
      VectorFunctions.nearestCentroid(col(vecCol), flat, norms, dim).as("cell"))
    val votes = assigned.groupBy(col("cell"), col("label"))
      .agg(count(lit(1)).as("votes"))
    val byCell = Window.partitionBy(col("cell"))
    val rank = byCell.orderBy(col("votes").desc, col("label"))
    votes.withColumn("n_vecs", sum(col("votes")).over(byCell))
      .withColumn("rn", row_number().over(rank))
      .filter(col("rn") === 1)
      .select(col("cell"), col("n_vecs"), col("label").as("maj_label"),
        col("votes").as("maj_votes"))
  }

  /** IVF (inverted-file) ANN — the classic FAISS-style scale path: a
    * spherical-k-means coarse quantizer (trained on a hash-deterministic
    * sample, Lloyd iterations entirely in DataFrame ops + a tiny
    * nlist×dim driver collect per round) partitions the corpus into `nlist`
    * cells; each query probes only its `nprobe` nearest cells.
    *
    * At 100 TB: training touches only the sample (`sampleMod`-th of the
    * corpus); the corpus-wide work is ONE map-side cell assignment (broadcast
    * centroids, no shuffle) plus the candidate equi-join on cell id —
    * scan cost drops by ~nlist/nprobe vs brute force while the join stays a
    * plain shuffle-hash join AQE can skew-split when cells are unbalanced.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, nlist: Int, nprobe: Int,
              iters: Int = 3, sampleMod: Int = 1, seed: Long = 42L,
              md5Init: Boolean = false): DataFrame = {
    val spark = corpus.sparkSession
    val sample = (if (sampleMod <= 1) corpus
      else corpus.filter(pmod(xxhash64(col(idCol), lit(seed)), lit(sampleMod)) === 0))
      .select(col(idCol).as("_id"), col(vecCol).as("_v"))

    // init: nlist hash-deterministic seed vectors, L2-normalized. md5Init
    // picks the md5-smallest ids (ivfTopKSeeded's scheme) instead of
    // xxhash64 order so a SQL oracle can replay the whole Lloyd loop —
    // DuckDB has md5 but not xxhash64.
    val ordered =
      if (md5Init) sample.orderBy(md5(col("_id").cast("string")),
        col("_id").cast("string"))
      else sample.orderBy(xxhash64(col("_id"), lit(seed + 1)))
    var centroids: Array[Array[Double]] = ordered
      .limit(nlist).select("_v").collect()
      .map(r => normalized(r.getSeq[Float](0).toArray.map(_.toDouble)))

    val dim0 = centroids.headOption.map(_.length).getOrElse(0)
    require(dim0 > 0, "ivfTopK: empty corpus sample — cannot train centroids")
    // unit-norm centroids → norms of 1.0, so the shared kernel's
    // dot/norm score reduces to the raw dot product
    def unitNorms = Array.fill(centroids.length)(1.0)

    for (_ <- 1 to iters) {
      // codegen cell assignment (no ScalaUDF: per-row boxed Seq[Float] was
      // the one interpreted hot-path in the corpus-wide pass)
      val assignC = VectorFunctions.nearestCentroid(
        col("_v"), centroids.flatten, unitNorms, dim0)
      // new centroid = mean of assigned vectors (spherical: renormalize)
      val sums = sample.withColumn("_cell", assignC)
        .select(col("_cell"), posexplode(col("_v")).as(Seq("_pos", "_x")))
        .groupBy("_cell", "_pos").agg(avg(col("_x")).as("_m"))
        .collect()
      val byCell = sums.groupBy(_.getInt(0))
      centroids = centroids.indices.map { c =>
        byCell.get(c) match {
          case Some(rows) =>
            val dim = rows.map(_.getInt(1)).max + 1
            val m = new Array[Double](dim)
            rows.foreach(r => m(r.getInt(1)) = r.getDouble(2))
            normalized(m)
          case None => centroids(c) // empty cell keeps its centroid
        }
      }.toArray
    }

    searchCells(queries, corpus, idCol, vecCol, k, nprobe,
      centroids.flatten, unitNorms, dim0)
  }

  /** IVF with a hash-deterministic coarse quantizer and NO Lloyd iterations:
    * the `nlist` centroids are the corpus vectors with the smallest
    * md5(CAST(id AS STRING)) (id tie-break) — a uniform deterministic sample
    * a SQL oracle reproduces exactly, making the whole pipeline (assignment,
    * probing, ranking) cross-engine verifiable. Cell score is
    * dot(v, c)/|c| (cosine up to the per-row constant |v|), ties to the
    * lowest cell id.
    *
    * Same 100 TB shape as [[ivfTopK]]: centroid selection reads nlist rows,
    * the corpus-wide work is ONE codegen'd map-side assignment plus the
    * candidate equi-join on cell id. Trained k-means centroids buy better
    * cell balance, not different mechanics — use [[ivfTopK]] when recall/cell
    * skew matters more than replicability.
    */
  def ivfTopKSeeded(queries: DataFrame, corpus: DataFrame, idCol: String,
                    vecCol: String, k: Int, nlist: Int, nprobe: Int): DataFrame = {
    val (flat, norms, dim) =
      seedCentroids(corpus, idCol, vecCol, nlist, "ivfTopKSeeded")
    searchCells(queries, corpus, idCol, vecCol, k, nprobe, flat, norms, dim)
  }

  /** md5-seeded coarse-quantizer centroids: the `nlist` corpus vectors with
    * the smallest md5(CAST(id AS STRING)) (id tie-break) — a deterministic
    * uniform sample a SQL oracle reproduces exactly. Shared by
    * [[ivfTopKSeeded]] and [[graft.operators.Dedup.semanticDedupPairs]].
    * Returns (flat row-major centroids, norms, dim); bounded nlist×dim
    * driver collect.
    */
  /** The nlist md5-smallest (id, vector) rows in pick order — the seeded
    * quantizer's identity, shared by build-time derivation and the
    * persisted-quantizer round trip.
    */
  private def pickCentroidRows(corpus: DataFrame, idCol: String,
                               vecCol: String, nlist: Int, caller: String)
      : Array[org.apache.spark.sql.Row] = {
    val picked = corpus
      .select(col(idCol).cast("string").as("_id"), col(vecCol).as("_v"))
      .orderBy(md5(col("_id")), col("_id"))
      .limit(nlist).collect()
    require(picked.nonEmpty, s"$caller: empty corpus")
    picked
  }

  private[graft] def seedCentroids(corpus: DataFrame, idCol: String,
                                   vecCol: String, nlist: Int,
                                   caller: String): (Array[Double], Array[Double], Int) =
    packCentroids(pickCentroidRows(corpus, idCol, vecCol, nlist, caller), caller)

  private def packCentroids(picked: Array[org.apache.spark.sql.Row],
                            caller: String): (Array[Double], Array[Double], Int) = {
    val dim = picked.head.getSeq[Float](1).length
    val flat = new Array[Double](picked.length * dim)
    val norms = new Array[Double](picked.length)
    var c = 0
    while (c < picked.length) {
      val v = picked(c).getSeq[Float](1)
      // ragged vectors: trailing dims stay 0.0 (mirrors the kernel's
      // math.min bound); zero-norm centroids would make every cell score
      // NaN, which DuckDB sorts as largest — reject instead of diverging.
      var s = 0.0; var i = 0
      while (i < math.min(dim, v.length)) {
        val x = v(i).toDouble; flat(c * dim + i) = x; s += x * x; i += 1
      }
      require(s > 0.0, s"$caller: zero-norm centroid vector ${picked(c).getString(0)}")
      norms(c) = math.sqrt(s)
      c += 1
    }
    (flat, norms, dim)
  }

  /** Shared IVF search stage: codegen'd map-side cell assignment over the
    * corpus, multi-probe explosion on the (broadcast) query side, candidate
    * equi-join on cell id, exact-cosine ranking.
    */
  private def searchCells(queries: DataFrame, corpus: DataFrame, idCol: String,
                          vecCol: String, k: Int, nprobe: Int,
                          flat: Array[Double], norms: Array[Double],
                          dim: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      VectorFunctions.nearestCentroid(col(vecCol), flat, norms, dim).as("cell"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("cell",
        explode(VectorFunctions.probeCentroids(col("qv"), flat, norms, dim, nprobe)))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorFunctions.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** Product-quantization ANN (the FAISS-style MEMORY scale path): each
    * corpus vector is compressed to `m` codeword indices (one per
    * contiguous `dim/m`-dim subspace), and queries score candidates by
    * asymmetric distance (ADC) against the reconstructed codewords — the
    * original corpus floats are DROPPED after the one-pass encode, so the
    * search pass moves `m` ints per row instead of `dim` floats (32x
    * smaller at m=4/dim=64, amortizing to ~1-3% of raw vector bytes at
    * production dims).
    *
    * Codebook: the `ncode` corpus vectors with the smallest
    * md5(CAST(id AS STRING)) (id tie-break), sliced per subspace — a
    * deterministic uniform sample a SQL oracle reproduces exactly (same
    * scheme as [[ivfTopKSeeded]]); k-means codebooks buy tighter cells,
    * not different mechanics. Like [[bruteForceTopK]] the scan shape is
    * broadcast-queries × one corpus pass (declared-design BNLJ) — compose
    * with the IVF cell join when candidate pruning is also needed.
    *
    * Output: (query_id, neighbor_id, rank, score). `score` is the ADC
    * dot-product against reconstructed codewords when `rerank <= 0`, and
    * the exact cosine of the re-ranked pair when `rerank > 0` — the two
    * are NOT comparable across calls that toggle `rerank`; only `rank` is.
    */
  def pqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
             vecCol: String, k: Int, m: Int, ncode: Int,
             rerank: Int = 0): DataFrame = {
    val picked = corpus
      .select(col(idCol).cast("string").as("_id"), col(vecCol).as("_v"))
      .orderBy(md5(col("_id")), col("_id"))
      .limit(ncode).collect()
    require(picked.nonEmpty, "pqTopK: empty corpus")
    val dim = picked.head.getSeq[Float](1).length
    require(dim % m == 0, s"pqTopK: dim $dim not divisible by m=$m")
    val dsub = dim / m
    // flat (m x ncode x dsub) codebook; ragged codeword vectors pad with 0.0
    val cb = new Array[Double](m * ncode * dsub)
    var c = 0
    while (c < picked.length) {
      val v = picked(c).getSeq[Float](1)
      var s = 0
      while (s < m) {
        var i = 0
        while (i < dsub) {
          val vi = s * dsub + i
          if (vi < v.length)
            cb(((s * ncode) + c) * dsub + i) = v(vi).toDouble
          i += 1
        }
        s += 1
      }
      c += 1
    }
    val codes = corpus.select(col(idCol).as("neighbor_id"),
      VectorFunctions.pqEncode(col(vecCol), cb, m, dsub, ncode).as("codes"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = codes.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("adc",
        VectorFunctions.pqAdcScore(col("codes"), col("qv"), cb, m, dsub, ncode))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("neighbor_id"))
    val adcTop = scored.withColumn("rank", row_number().over(w))
    if (rerank <= 0)
      adcTop.filter(col("rank") <= k)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          col("adc").as("score"))
    else {
      // exact re-rank of the ADC top-R: quantization collapses
      // WITHIN-cell ordering (cluster members share codes → tied scores),
      // so the compressed scan finds the right neighborhood and a bounded
      // equi-join back to the vectors restores the fine ordering. R·|queries|
      // rows re-read vectors — corpus-size-independent.
      val r = math.max(rerank, k)
      val cand = adcTop.filter(col("rank") <= r)
        .select("query_id", "neighbor_id", "qv")
      val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      val exact = cand.join(cv, "neighbor_id")
        .withColumn("cosine", VectorFunctions.cosine(col("qv"), col("cv")))
      val w2 = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))
      exact.withColumn("rank", row_number().over(w2))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          col("cosine").as("score"))
    }
  }

  /** IVF + PQ — the full FAISS-IVFADC shape, composed from the two scale
    * paths: the md5-seeded coarse quantizer prunes candidates to `nprobe`
    * cells (equi-join on cell id — unlike [[pqTopK]] there is NO
    * nested-loop scan), and candidates are scored by ADC over `m`-int PQ
    * codes, never the original floats. One corpus pass emits (cell, codes)
    * — after it, the 100 TB of embedding floats is out of the pipeline
    * entirely; re-ranking re-reads vectors only for the bounded ADC top-R.
    *
    * Simplification vs FAISS: codes quantize the RAW vectors (IVFFlat-PQ),
    * not per-cell residuals — residual encoding buys accuracy, not a
    * different plan shape, and raw-vector codes keep the oracle replay to
    * one codebook.
    *
    * Output: (query_id, neighbor_id, rank, score) — same `score` contract
    * as [[pqTopK]]: ADC dot-product when `rerank <= 0`, exact cosine when
    * `rerank > 0`; comparable only within one `rerank` setting.
    */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                vecCol: String, k: Int, nlist: Int, nprobe: Int,
                m: Int, ncode: Int, rerank: Int = 0): DataFrame = {
    val picked = corpus
      .select(col(idCol).cast("string").as("_id"), col(vecCol).as("_v"))
      .orderBy(md5(col("_id")), col("_id"))
      .limit(math.max(nlist, ncode)).collect()
    require(picked.nonEmpty, "ivfPqTopK: empty corpus")
    val dim = picked.head.getSeq[Float](1).length
    require(dim % m == 0, s"ivfPqTopK: dim $dim not divisible by m=$m")
    val dsub = dim / m
    // coarse centroids: the first nlist picked rows (same zero-pad /
    // zero-norm contract as ivfTopKSeeded)
    val nCells = math.min(nlist, picked.length)
    val flat = new Array[Double](nCells * dim)
    val norms = new Array[Double](nCells)
    var c = 0
    while (c < nCells) {
      val v = picked(c).getSeq[Float](1)
      var s = 0.0; var i = 0
      while (i < math.min(dim, v.length)) {
        val x = v(i).toDouble; flat(c * dim + i) = x; s += x * x; i += 1
      }
      require(s > 0.0, s"ivfPqTopK: zero-norm centroid vector ${picked(c).getString(0)}")
      norms(c) = math.sqrt(s)
      c += 1
    }
    // PQ codebook: the first ncode picked rows, sliced per subspace
    val nCode = math.min(ncode, picked.length)
    val cb = new Array[Double](m * nCode * dsub)
    c = 0
    while (c < nCode) {
      val v = picked(c).getSeq[Float](1)
      var s = 0
      while (s < m) {
        var i = 0
        while (i < dsub) {
          val vi = s * dsub + i
          if (vi < v.length) cb(((s * nCode) + c) * dsub + i) = v(vi).toDouble
          i += 1
        }
        s += 1
      }
      c += 1
    }
    val enc = corpus.select(col(idCol).as("neighbor_id"),
      VectorFunctions.nearestCentroid(col(vecCol), flat, norms, dim).as("cell"),
      VectorFunctions.pqEncode(col(vecCol), cb, m, dsub, nCode).as("codes"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("cell",
        explode(VectorFunctions.probeCentroids(col("qv"), flat, norms, dim, nprobe)))
    val scored = enc.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc",
        VectorFunctions.pqAdcScore(col("codes"), col("qv"), cb, m, dsub, nCode))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("neighbor_id"))
    val adcTop = scored.withColumn("rank", row_number().over(w))
    if (rerank <= 0)
      adcTop.filter(col("rank") <= k)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          col("adc").as("score"))
    else {
      val r = math.max(rerank, k)
      val cand = adcTop.filter(col("rank") <= r)
        .select("query_id", "neighbor_id", "qv")
      val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      val exact = cand.join(cv, "neighbor_id")
        .withColumn("cosine", VectorFunctions.cosine(col("qv"), col("cv")))
      val w2 = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))
      exact.withColumn("rank", row_number().over(w2))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          col("cosine").as("score"))
    }
  }

  private def normalized(v: Array[Double]): Array[Double] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0.0) v else v.map(_ / n)
  }
}
