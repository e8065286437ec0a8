package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted canonical-map index laws: the partitioned+bucketed table equals
  * the inline CC recompute, folds preserve the exactness law AND the bucket
  * layout (consumers must stay Exchange-free after every fold), re-folding
  * the same delta is a no-op (interrupted-retry safety), and a fold rewrites
  * ONLY the pbucket partitions holding changed rows — untouched partitions'
  * files are byte-identical on disk (the delta-proportional-rewrite
  * contract that makes daily maintenance affordable at 100 TB).
  */
class CanonicalMapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairsDf(ps: Seq[(Long, Long)]) = ps.toDF("doc_a", "doc_b")

  private def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.select(col("doc_id").cast("long"), col("canonical_id").cast("long"))
      .as[(Long, Long)].collect().toMap

  private def tableLocation(table: String): String = {
    val loc = spark.sql(s"DESCRIBE EXTENDED $table")
      .where(col("col_name") === "Location")
      .select("data_type").as[String].head()
    new java.net.URI(loc).getPath
  }

  /** (absolute path → (size, mtime)) for every data file under the table. */
  private def fileInventory(table: String): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(tableLocation(table)))
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath -> (f.length(), f.lastModified())).toMap
  }

  test("buildCanonicalMap table == duplicateGroups inline recompute") {
    val p = pairsDf(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    Dedup.buildCanonicalMap(p, "doc_a", "doc_b", "cmap_spec_build", nBuckets = 4)
    try {
      assert(asMap(spark.table("cmap_spec_build")) ==
        asMap(Dedup.duplicateGroups(p, "doc_a", "doc_b")))
    } finally spark.sql("DROP TABLE IF EXISTS cmap_spec_build")
  }

  test("consumers of the map are Exchange-free on doc_id (bucketed), " +
    "including after a partitioned fold") {
    val p1 = pairsDf(Seq((1L, 2L), (5L, 6L)))
    Dedup.buildCanonicalMap(p1, "doc_a", "doc_b", "cmap_spec_x", nBuckets = 4)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def mapSidePlan(): String =
        spark.table("cmap_spec_x").groupBy("doc_id")
          .agg(min("canonical_id"))
          .queryExecution.executedPlan.toString
      assert(!mapSidePlan().contains("Exchange hashpartitioning"),
        mapSidePlan().take(1500))
      // fold rewrites touched partitions in place — the bucket spec (and
      // the Exchange-free consumer contract) must survive the overwrite
      Dedup.foldIntoCanonicalMap("cmap_spec_x",
        pairsDf(Seq((2L, 3L))), "doc_a", "doc_b")
      assert(!mapSidePlan().contains("Exchange hashpartitioning"),
        mapSidePlan().take(1500))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS cmap_spec_x")
    }
  }

  test("foldIntoCanonicalMap == full recompute over the pair union, and " +
    "re-folding the same delta is a no-op") {
    val p1 = Seq((1L, 2L), (3L, 4L), (20L, 21L))
    val p2 = Seq((2L, 3L), (30L, 31L)) // merges {1,2} with {3,4} + new comp
    Dedup.buildCanonicalMap(pairsDf(p1), "doc_a", "doc_b",
      "cmap_spec_fold", nBuckets = 4)
    try {
      Dedup.foldIntoCanonicalMap("cmap_spec_fold", pairsDf(p2),
        "doc_a", "doc_b")
      val expect = asMap(Dedup.duplicateGroups(pairsDf(p1 ++ p2),
        "doc_a", "doc_b"))
      assert(asMap(spark.table("cmap_spec_fold")) == expect)
      assert(expect(4L) == 1L) // the merge actually happened
      // idempotence: the same delta folds to the same table, AND (the
      // no-op contract) rewrites nothing on disk
      val inv = fileInventory("cmap_spec_fold")
      Dedup.foldIntoCanonicalMap("cmap_spec_fold", pairsDf(p2),
        "doc_a", "doc_b")
      assert(asMap(spark.table("cmap_spec_fold")) == expect)
      assert(fileInventory("cmap_spec_fold") == inv,
        "re-folding an already-folded delta must not rewrite any file")
    } finally spark.sql("DROP TABLE IF EXISTS cmap_spec_fold")
  }

  test("a fold rewrites ONLY the partitions holding changed rows") {
    // spread components across partitions: many singleton-pair components
    // so that several pbuckets are populated and most hold no changed row
    val base = (0L until 40L by 2L).map(i => (i, i + 1L))
    Dedup.buildCanonicalMap(pairsDf(base), "doc_a", "doc_b",
      "cmap_spec_part", nBuckets = 2, nPartitions = 4)
    try {
      val before = fileInventory("cmap_spec_part")
      assert(before.nonEmpty)
      val mapBefore = asMap(spark.table("cmap_spec_part"))
      // merge components {0,1} and {2,3}, and add a new component {100,101}
      Dedup.foldIntoCanonicalMap("cmap_spec_part",
        pairsDf(Seq((1L, 2L), (100L, 101L))), "doc_a", "doc_b")
      val mapAfter = asMap(spark.table("cmap_spec_part"))
      val changedDocs = (mapAfter.keySet ++ mapBefore.keySet).filter(d =>
        mapBefore.get(d) != mapAfter.get(d))
      assert(changedDocs.nonEmpty)
      // expected touched pbuckets, via the same hash the operator uses
      val touched = changedDocs.toSeq.toDF("doc_id")
        .select(pmod(xxhash64(col("doc_id")), lit(4L))).as[Long]
        .collect().toSet
      assert(touched.size < 4, // the scenario must leave >=1 untouched
        s"test scenario degenerate: every partition touched ($touched)")
      val after = fileInventory("cmap_spec_part")
      val untouchedBefore = before.filter { case (p, _) =>
        !touched.exists(t => p.contains(s"pbucket=$t")) }
      untouchedBefore.foreach { case (p, meta) =>
        assert(after.get(p).contains(meta),
          s"untouched-partition file rewritten by fold: $p")
      }
      // ... and the touched partitions really did rewrite
      assert(before.keySet.filter(p =>
        touched.exists(t => p.contains(s"pbucket=$t"))) !=
        after.keySet.filter(p =>
          touched.exists(t => p.contains(s"pbucket=$t"))) ||
        before.exists { case (p, meta) =>
          touched.exists(t => p.contains(s"pbucket=$t")) &&
            !after.get(p).contains(meta) },
        "no touched-partition file changed — fold wrote nothing?")
      // exactness across the partitioned rewrite
      assert(mapAfter == asMap(Dedup.duplicateGroups(
        pairsDf(base ++ Seq((1L, 2L), (100L, 101L))), "doc_a", "doc_b")))
    } finally spark.sql("DROP TABLE IF EXISTS cmap_spec_part")
  }
}
