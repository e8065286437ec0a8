package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BM25-surrogate retrieval laws on a hand-built corpus: ranking order,
  * tf saturation, idf weighting, disjunctive semantics, k cap.
  */
class SearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(rows: (Long, String)*) = rows.toDF("doc_id", "text")
  private def q(rows: (Long, String)*) = rows.toDF("query_id", "term")

  test("doc matching more query terms outranks single-term match; ties break on doc_id") {
    val docs = corpus(
      1L -> "alpha beta gamma", 2L -> "alpha delta epsilon",
      3L -> "beta zeta eta", 4L -> "theta iota kappa")
    val got = Search.bm25TopK(docs, "doc_id", "text", q(7L -> "alpha", 7L -> "beta"), 10)
      .orderBy("rnk").collect()
    // doc 1 matches both terms; docs 2 and 3 one each with equal stats
    assert(got.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L))
    assert(got.head.getLong(4) == 2L) // n_terms
    assert(got(1).getLong(3) == got(2).getLong(3)) // symmetric single-term scores
  }

  test("rarer term carries a higher score than a common term (idf)") {
    val docs = corpus(
      1L -> "common rare", 2L -> "common x", 3L -> "common y", 4L -> "common z")
    val rare = Search.bm25TopK(docs, "doc_id", "text", q(1L -> "rare"), 10)
      .filter(col("doc_id") === 1).select("score_fp").as[Long].head()
    val comm = Search.bm25TopK(docs, "doc_id", "text", q(1L -> "common"), 10)
      .filter(col("doc_id") === 1).select("score_fp").as[Long].head()
    assert(rare > comm)
  }

  test("tf saturates: doubling tf less than doubles the score") {
    val docs = corpus(
      1L -> "term pad1 pad2 pad3", 2L -> "term term pad2 pad3", 3L -> "other a b c")
    val s = Search.bm25TopK(docs, "doc_id", "text", q(1L -> "term"), 10)
      .orderBy("doc_id").select("doc_id", "score_fp").as[(Long, Long)].collect().toMap
    assert(s(2) > s(1))          // more tf, same dl → higher
    assert(s(2) < 2 * s(1))      // …but saturating
  }

  test("terms absent from the corpus contribute nothing; unmatched queries yield no rows") {
    val docs = corpus(1L -> "alpha beta", 2L -> "beta gamma")
    val got = Search.bm25TopK(docs, "doc_id", "text",
      q(1L -> "alpha", 1L -> "nosuchterm", 2L -> "missingonly"), 10)
    val rows = got.collect()
    assert(rows.forall(_.getLong(0) == 1L))
    val alphaOnly = Search.bm25TopK(docs, "doc_id", "text", q(1L -> "alpha"), 10)
      .select("doc_id", "score_fp").as[(Long, Long)].collect().toSet
    assert(got.select("doc_id", "score_fp").as[(Long, Long)].collect().toSet == alphaOnly)
  }

  test("k caps results per query and rnk is dense from 1") {
    val docs = corpus((1L to 20L).map(i => i -> s"needle pad$i"): _*)
    val got = Search.bm25TopK(docs, "doc_id", "text", q(1L -> "needle"), 5)
      .orderBy("rnk").collect()
    assert(got.length == 5)
    assert(got.map(_.getLong(1)).toSeq == (1L to 5L))
  }

  test("blank and empty docs are tolerated (count toward N, zero length)") {
    val docs = corpus(1L -> "alpha beta", 2L -> "   ", 3L -> "")
    val got = Search.bm25TopK(docs, "doc_id", "text", q(1L -> "alpha"), 10).collect()
    assert(got.map(_.getLong(2)).toSeq == Seq(1L))
    assert(got.head.getLong(3) > 0)
  }
}
