package graft.plans

import graft.{SparkEntry, TestSpark}
import graft.tools.PlanAudit
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The plan audit as a CI gate: every driver-contract query's FINAL
  * adaptive plan must be free of unexpected nested-loop/cartesian joins and
  * unpruned scans. A plan regression (broadcast that degrades to BNLJ, a
  * projection that stops pruning) fails the build, not a dev glance.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  // ground-truth baselines that are pairwise BY DECLARED DESIGN (broadcast
  // queries × one corpus pass); their scale-safe siblings (lshTopK/ivfTopK,
  // embeddingPairs) are audited like everything else. ann_recall_audit
  // embeds the brute-force ground truth as one of its two sides — same
  // declared-design exemption, same bounded broadcast shape.
  // q_kmv_overlap's type_a < type_b pairing is a |groups|^2 cross of
  // POST-AGGREGATE sketch rows (5x5 of 512-byte arrays) — bounded by group
  // cardinality, not data size
  // ann_pq_topk: compressed brute force — broadcast queries x one pass
  // over m-int codes (not vectors); same declared-design scan shape
  // ann_ivf_recall_audit: like ann_recall_audit, embeds the brute-force
  // ground truth as the audit's reference side
  private val bnljByDesign =
    Set("ann_cosine_topk", "dedup_embedding_exact", "ann_recall_audit",
      "q_kmv_overlap", "ann_pq_topk", "ann_ivf_recall_audit")

  // One registered test PER query: a single broken query (round 6: one
  // analysis error in the events family) must not abort the audit of the
  // other hundred plans.
  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"plan audit: $name") {
      val a = PlanAudit.audit(fn(spark, sf))
      val flags = if (bnljByDesign(name)) a.flags.filterNot(_ == "NESTED_LOOP")
                  else a.flags
      assert(flags.isEmpty,
        s"$name: ${flags.mkString(",")} (scans=${a.scanWidths.mkString("/")})")
    }
  }

  test("a deliberately degenerate plan (non-equi join) fails the audit") {
    import spark.implicits._
    val a = Seq((1, 2), (3, 4)).toDF("x", "y")
    val b = Seq((1, 2), (3, 4)).toDF("u", "v")
    val broken = a.join(b, a("x") < b("u"))
    val flagged = PlanAudit.audit(broken).flags
    assert(flagged.contains("NESTED_LOOP") || flagged.contains("CARTESIAN"),
      s"auditor must flag a non-equi join, got $flagged")
  }

  test("a global-rank window (even via a constant-folded lit partition) is flagged") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = Seq((1L, 2.0), (3L, 4.0)).toDF("id", "score")
    // the round-7 trap: lit(0) LOOKS like a partition key but folds away
    val ranked = df.withColumn("rnk", row_number().over(
      Window.partitionBy(lit(0)).orderBy(col("score"))))
    assert(PlanAudit.audit(ranked).flags.contains("GLOBAL_WINDOW"))
    // a properly partitioned window is NOT flagged
    val ok = df.withColumn("rnk", row_number().over(
      Window.partitionBy(col("id")).orderBy(col("score"))))
    assert(!PlanAudit.audit(ok).flags.contains("GLOBAL_WINDOW"))
  }

  test("filters on headline scans reach the parquet reader (PushedFilters)") {
    val q1 = SparkEntry.queries("q1_pricing_summary")(spark, sf)
    val a = PlanAudit.audit(q1)
    assert(a.pushedFilters.exists(_.contains("l_shipdate")),
      s"q1's l_shipdate filter must push into the scan, got ${a.pushedFilters}")
    val q3 = SparkEntry.queries("q3_top_revenue_orders")(spark, sf)
    val a3 = PlanAudit.audit(q3)
    assert(a3.pushedFilters.exists(_.contains("c_mktsegment")),
      s"q3's c_mktsegment filter must push into the scan, got ${a3.pushedFilters}")
  }
}
