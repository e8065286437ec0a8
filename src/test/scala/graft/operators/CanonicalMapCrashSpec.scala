package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Crash safety of the canonical-map fold's JOURNALED COMMIT protocol
  * ([[Dedup.foldIntoCanonicalMap]] / [[Dedup.repairCanonicalMap]] /
  * [[Dedup.openCanonicalMap]]). Failpoints cut the fold at each documented
  * crash window; the specs then prove the repair path restores the EXACT
  * map — including the two torn-partial-commit shapes a naive fold replay
  * cannot fix:
  *
  *   - the FIXED-POINT-VIOLATING tear (doc's row committed, its old
  *     canonical's row not): detectable from the rows, but a replayed fold
  *     no-ops on it forever (the mixed map hides the old component);
  *   - the SILENT-SPLIT tear (old canonical's row committed, a member's
  *     not): the mixed map is a perfectly valid duplicateGroups output of
  *     the WRONG pair set — undetectable from the rows by construction,
  *     which is why detection rides the pending-fold marker, not a row
  *     audit.
  */
class CanonicalMapCrashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairsDf(ps: Seq[(Long, Long)]) = ps.toDF("doc_a", "doc_b")

  private def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.select(col("doc_id").cast("long"), col("canonical_id").cast("long"))
      .as[(Long, Long)].collect().toMap

  private def drop(tables: String*): Unit = tables.foreach { t =>
    spark.sql(s"DROP TABLE IF EXISTS `$t`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      t.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** smallest nPartitions separating every listed doc into its own pbucket
    * (same hash as the operator) — keeps the partial-commit simulations
    * able to commit one doc's partition but not another's */
  private def separatingNPartitions(docs: Seq[Long]): Int = {
    val hashes = docs.toDF("doc_id")
      .select(col("doc_id"), xxhash64(col("doc_id")).as("h"))
      .as[(Long, Long)].collect().toMap
    (2 to 64).find { np =>
      docs.map(d => math.floorMod(hashes(d), np.toLong)).distinct.size ==
        docs.size
    }.getOrElse(fail("no partition count separates the fixture docs"))
  }

  private def foldExpectingCrash(table: String, ps: Seq[(Long, Long)],
                                 at: String): Unit = {
    sys.props(FailPoint.Prop) = at
    try {
      val e = intercept[IllegalStateException] {
        Dedup.foldIntoCanonicalMap(table, pairsDf(ps), "doc_a", "doc_b")
      }
      assert(e.getMessage == s"failpoint: $at")
    } finally sys.props -= FailPoint.Prop
  }

  /** simulate the torn dynamic-overwrite commit: apply the journal to ONLY
    * the given pbuckets (the crash-inside-commit state the protocol exists
    * to repair) */
  private def partialCommit(table: String, pbuckets: Set[Long]): Unit = {
    val modeKey = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(modeKey)
    spark.conf.set(modeKey, "dynamic")
    try spark.table(s"${table}_foldlog")
      .where(col("pbucket").isin(pbuckets.map(Long.box).toSeq: _*))
      .repartition(col("pbucket"))
      .select("doc_id", "canonical_id", "pbucket")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).insertInto(table)
    finally prev match {
      case Some(v) => spark.conf.set(modeKey, v)
      case None => spark.conf.unset(modeKey)
    }
  }

  private def pbucket(doc: Long, np: Int): Long =
    Seq(doc).toDF("doc_id")
      .select(pmod(xxhash64(col("doc_id")), lit(np.toLong)))
      .as[Long].head()

  test("fixed-point-violating tear: partial commit detected and repaired " +
    "exactly; a naive fold replay would no-op on it forever") {
    val t = "cmapc_tear1"
    drop(t, s"${t}_foldlog")
    // components {1,2} (canon 1) and {3,4} (canon 3); delta (2,3) merges
    // them — changed rows are 3→1 and 4→1, in different pbuckets
    val np = separatingNPartitions(Seq(3L, 4L))
    Dedup.buildCanonicalMap(pairsDf(Seq((1L, 2L), (3L, 4L))),
      "doc_a", "doc_b", t, nBuckets = 2, nPartitions = np)
    try {
      foldExpectingCrash(t, Seq((2L, 3L)), "cmap-after-marker")
      // commit ONLY doc 3's partition: map reads {1→1,2→1,3→1,4→3} — row
      // 4→3 points at a non-fixed-point canonical
      partialCommit(t, Set(pbucket(3L, np)))
      assert(asMap(spark.table(t)) ==
        Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L))
      assert(Dedup.canonicalMapViolations(spark.table(t)).count() == 1)
      // the repair completes the fold from the journal
      assert(Dedup.repairCanonicalMap(spark, t))
      val expect = asMap(Dedup.duplicateGroups(
        pairsDf(Seq((1L, 2L), (3L, 4L), (2L, 3L))), "doc_a", "doc_b"))
      assert(asMap(spark.table(t)) == expect)
      assert(expect(4L) == 1L)
      assert(Dedup.canonicalMapViolations(spark.table(t)).count() == 0)
      // marker cleared, journal gone — a second repair is a no-op
      assert(!Dedup.repairCanonicalMap(spark, t))
      assert(!spark.catalog.tableExists(s"${t}_foldlog"))
    } finally drop(t, s"${t}_foldlog")
  }

  test("SILENT-SPLIT tear (fixed-point-consistent mixed state) — " +
    "undetectable from rows, still repaired via the marker") {
    val t = "cmapc_tear2"
    drop(t, s"${t}_foldlog")
    // components {1,2} (canon 1) and {3,4} (canon 3); delta (2,4) merges
    // them — changed rows 3→1 and 4→1. Committing ONLY doc 4's partition
    // leaves {1→1,2→1,3→3,4→1}: every canonical is a fixed point, yet doc
    // 3 is silently split from its component.
    val np = separatingNPartitions(Seq(3L, 4L))
    Dedup.buildCanonicalMap(pairsDf(Seq((1L, 2L), (3L, 4L))),
      "doc_a", "doc_b", t, nBuckets = 2, nPartitions = np)
    try {
      foldExpectingCrash(t, Seq((2L, 4L)), "cmap-after-marker")
      partialCommit(t, Set(pbucket(4L, np)))
      assert(asMap(spark.table(t)) ==
        Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 1L))
      // the row audit CANNOT see this tear — that is the point of the
      // journal protocol
      assert(Dedup.canonicalMapViolations(spark.table(t)).count() == 0)
      // reader-side repair: openCanonicalMap serves the healed map
      val healed = asMap(Dedup.openCanonicalMap(spark, t))
      assert(healed == asMap(Dedup.duplicateGroups(
        pairsDf(Seq((1L, 2L), (3L, 4L), (2L, 4L))), "doc_a", "doc_b")))
      assert(healed(3L) == 1L && healed(4L) == 1L)
    } finally drop(t, s"${t}_foldlog")
  }

  test("fold-entry auto-repair: the next fold completes a torn predecessor " +
    "before applying its own delta") {
    val t = "cmapc_auto"
    drop(t, s"${t}_foldlog")
    val np = separatingNPartitions(Seq(3L, 4L))
    Dedup.buildCanonicalMap(pairsDf(Seq((1L, 2L), (3L, 4L))),
      "doc_a", "doc_b", t, nBuckets = 2, nPartitions = np)
    try {
      foldExpectingCrash(t, Seq((2L, 3L)), "cmap-after-marker")
      partialCommit(t, Set(pbucket(3L, np)))
      // no explicit repair: the NEXT fold heals, then applies its delta
      Dedup.foldIntoCanonicalMap(t, pairsDf(Seq((100L, 101L))),
        "doc_a", "doc_b")
      assert(asMap(spark.table(t)) == asMap(Dedup.duplicateGroups(
        pairsDf(Seq((1L, 2L), (3L, 4L), (2L, 3L), (100L, 101L))),
        "doc_a", "doc_b")))
      assert(!Dedup.repairCanonicalMap(spark, t))
    } finally drop(t, s"${t}_foldlog")
  }

  test("crash BEFORE the marker: stale journal is inert, map intact, " +
    "re-running the fold succeeds") {
    val t = "cmapc_premark"
    drop(t, s"${t}_foldlog")
    Dedup.buildCanonicalMap(pairsDf(Seq((1L, 2L), (3L, 4L))),
      "doc_a", "doc_b", t, nBuckets = 2, nPartitions = 4)
    try {
      val before = asMap(spark.table(t))
      foldExpectingCrash(t, Seq((2L, 3L)), "cmap-after-journal")
      // journal exists but no marker: nothing pending, map untouched
      assert(spark.catalog.tableExists(s"${t}_foldlog"))
      assert(!Dedup.repairCanonicalMap(spark, t))
      assert(asMap(spark.table(t)) == before)
      // the re-run drops the stale journal and completes normally
      Dedup.foldIntoCanonicalMap(t, pairsDf(Seq((2L, 3L))), "doc_a", "doc_b")
      assert(asMap(spark.table(t)) == asMap(Dedup.duplicateGroups(
        pairsDf(Seq((1L, 2L), (3L, 4L), (2L, 3L))), "doc_a", "doc_b")))
      assert(!spark.catalog.tableExists(s"${t}_foldlog"))
    } finally drop(t, s"${t}_foldlog")
  }

  test("crash AFTER the overwrite (marker still set): repair re-applies " +
    "the journal idempotently") {
    val t = "cmapc_postcommit"
    drop(t, s"${t}_foldlog")
    Dedup.buildCanonicalMap(pairsDf(Seq((1L, 2L), (3L, 4L))),
      "doc_a", "doc_b", t, nBuckets = 2, nPartitions = 4)
    try {
      foldExpectingCrash(t, Seq((2L, 3L)), "cmap-after-overwrite")
      val expect = asMap(Dedup.duplicateGroups(
        pairsDf(Seq((1L, 2L), (3L, 4L), (2L, 3L))), "doc_a", "doc_b"))
      assert(asMap(spark.table(t)) == expect) // data already committed
      assert(Dedup.repairCanonicalMap(spark, t)) // marker was still set
      assert(asMap(spark.table(t)) == expect)
      assert(!Dedup.repairCanonicalMap(spark, t))
    } finally drop(t, s"${t}_foldlog")
  }

  test("repair preserves the consumer contract: bucketed doc_id joins stay " +
    "Exchange-free after a torn-fold repair") {
    val t = "cmapc_bucket"
    drop(t, s"${t}_foldlog")
    val np = separatingNPartitions(Seq(3L, 4L))
    Dedup.buildCanonicalMap(pairsDf(Seq((1L, 2L), (3L, 4L))),
      "doc_a", "doc_b", t, nBuckets = 2, nPartitions = np)
    try {
      foldExpectingCrash(t, Seq((2L, 3L)), "cmap-after-marker")
      partialCommit(t, Set(pbucket(3L, np)))
      assert(Dedup.repairCanonicalMap(spark, t))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val plan = spark.table(t).groupBy("doc_id")
          .agg(min("canonical_id")).queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning"), plan.take(1500))
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally drop(t, s"${t}_foldlog")
  }
}
