package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale rehearsal: dedup is REPLICATION-EQUIVARIANT. Replicating every
  * document R times (distinct ids, identical text) turns each base
  * near-dup component of size s into one component of size s·R — and every
  * replicated doc into a viral R-clique of exact duplicates, the skew shape
  * the auto-salt verify join exists for. The laws below must hold for ANY
  * R, so passing at R=8 on the sf0.01 corpus (4000 docs, every single one
  * inside an exact-dup clique) is evidence the operator pipeline preserves
  * structure as duplication density explodes — the regime a crawl corpus
  * actually lives in — not just on the planted-pair fixtures.
  */
class ScaleStressSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val R = 8
  private val sfDir = "/root/testdata/sf0.01"

  // replica r of doc d gets id d*R + r: disjoint ids, text unchanged
  private lazy val base = spark.read.parquet(s"$sfDir/documents.parquet")
    .select(col("doc_id").cast("long").as("doc_id"), col("text"))
  private lazy val replicated = (0 until R).map { r =>
    base.select((col("doc_id") * R + lit(r)).as("doc_id"), col("text"))
  }.reduce(_ union _)

  test("law: exact dedupe group sizes scale by exactly R") {
    val baseGroups = Dedup.exact(base, "doc_id", "text")
      .select(col("content_hash"), col("n_copies")).as[(String, Long)]
      .collect().toMap
    val bigGroups = Dedup.exact(replicated, "doc_id", "text")
      .select(col("content_hash"), col("n_copies")).as[(String, Long)]
      .collect().toMap
    assert(bigGroups.keySet == baseGroups.keySet, "same distinct texts")
    baseGroups.foreach { case (h, n) =>
      assert(bigGroups(h) == n * R, s"hash $h: ${bigGroups(h)} != $n * $R")
    }
  }

  test("law: near-dup components merge replicas — count preserved, size ×R") {
    val basePairs = Dedup.ngramJaccardPairs(base, "doc_id", "text", 3, 0.8)
    val baseComp = Dedup.duplicateGroups(basePairs, "doc_a", "doc_b")
      .groupBy("canonical_id").agg(count(lit(1)).as("sz"))
      .select(col("canonical_id").cast("long"), col("sz")).as[(Long, Long)]
      .collect().toMap

    val bigPairs = Dedup.ngramJaccardPairs(replicated, "doc_id", "text", 3, 0.8)
    val bigComp = Dedup.duplicateGroups(bigPairs, "doc_a", "doc_b")
      .groupBy("canonical_id").agg(count(lit(1)).as("sz"))
      .select(col("canonical_id").cast("long"), col("sz")).as[(Long, Long)]
      .collect().toMap

    // every base component {d1..ds} becomes one component over all its
    // replicas: size s*R, canonical = min(d)*R (replica 0 of the min doc).
    // Docs NOT in any base component (not near-dup to anything) still gain
    // an R-clique of their own exact copies: size R, canonical d*R.
    assert(bigComp.size >= baseComp.size)
    baseComp.foreach { case (c, s) =>
      assert(bigComp(c * R) == s * R, s"component $c: ${bigComp(c * R)} != $s*$R")
    }
    val inBaseComponents = baseComp.values.sum // docs inside near-dup comps
    val singletons = bigComp.size - baseComp.size
    // all remaining docs form pure-replica cliques of exactly size R
    bigComp.filterNot { case (c, _) => baseComp.contains(c / R) && c % R == 0 }
      .foreach { case (c, s) => assert(s == R, s"replica clique $c size $s") }
    assert(
      singletons.toLong == base.count() - inBaseComponents,
      "every non-component doc must surface as one R-clique")
  }

  test("law: canonical representatives pick replica 0 of the best base doc") {
    val pairs = Dedup.ngramJaccardPairs(replicated, "doc_id", "text", 3, 0.8)
    val groups = Dedup.duplicateGroups(pairs, "doc_a", "doc_b")
    val scored = replicated.select(col("doc_id"),
      graft.functions.TextFunctions.nTokens(col("text")).cast("long").as("s"))
    val reps = Dedup.canonicalRepresentatives(groups, scored, "doc_id", "s")
      .select(col("canonical_id").cast("long"), col("keep_id").cast("long"))
      .as[(Long, Long)].collect()
    // identical texts ⇒ identical scores within a replica clique; the tie
    // must break to the smallest id deterministically (replica 0 of the
    // smallest-id best doc), never an arbitrary replica
    reps.foreach { case (c, keep) =>
      assert(keep % R == 0, s"group $c kept replica ${keep % R}, not 0")
    }
  }
}
