package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted canonical-map index laws: the bucketed table equals the inline
  * CC recompute, folds preserve the exactness law AND the bucket layout
  * (consumers must stay Exchange-free after every fold), and re-folding the
  * same delta is a no-op (interrupted-retry safety).
  */
class CanonicalMapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairsDf(ps: Seq[(Long, Long)]) = ps.toDF("doc_a", "doc_b")

  private def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.select(col("doc_id").cast("long"), col("canonical_id").cast("long"))
      .as[(Long, Long)].collect().toMap

  test("buildCanonicalMap table == duplicateGroups inline recompute") {
    val p = pairsDf(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    Dedup.buildCanonicalMap(p, "doc_a", "doc_b", "cmap_spec_build", nBuckets = 4)
    try {
      assert(asMap(spark.table("cmap_spec_build")) ==
        asMap(Dedup.duplicateGroups(p, "doc_a", "doc_b")))
    } finally spark.sql("DROP TABLE IF EXISTS cmap_spec_build")
  }

  test("consumers of the map are Exchange-free on doc_id (bucketed), " +
    "including after a fold swap") {
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
      // fold rewrites through the staging swap — the bucket spec (and the
      // Exchange-free consumer contract) must survive the rename
      Dedup.foldIntoCanonicalMap("cmap_spec_x",
        pairsDf(Seq((2L, 3L))), "doc_a", "doc_b", nBuckets = 4)
      assert(!mapSidePlan().contains("Exchange hashpartitioning"),
        mapSidePlan().take(1500))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS cmap_spec_x")
      spark.sql("DROP TABLE IF EXISTS cmap_spec_x__next")
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
        "doc_a", "doc_b", nBuckets = 4)
      val expect = asMap(Dedup.duplicateGroups(pairsDf(p1 ++ p2),
        "doc_a", "doc_b"))
      assert(asMap(spark.table("cmap_spec_fold")) == expect)
      assert(expect(4L) == 1L) // the merge actually happened
      // idempotence: the same delta folds to the same table
      Dedup.foldIntoCanonicalMap("cmap_spec_fold", pairsDf(p2),
        "doc_a", "doc_b", nBuckets = 4)
      assert(asMap(spark.table("cmap_spec_fold")) == expect)
    } finally {
      spark.sql("DROP TABLE IF EXISTS cmap_spec_fold")
      spark.sql("DROP TABLE IF EXISTS cmap_spec_fold__next")
    }
  }
}
