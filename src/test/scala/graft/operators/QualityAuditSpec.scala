package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualityAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def report(df: org.apache.spark.sql.DataFrame): Map[(String, String), (Long, Boolean)] =
    df.collect().map(r => (r.getString(0), r.getString(1)) ->
      ((r.getLong(2), r.getBoolean(5)))).toMap

  test("audit compiles the whole suite into one pass with exact counts") {
    val rows = Seq[(java.lang.Long, String, String, java.lang.Long)](
      (1L, "alpha", "en", 10L), (2L, "beta", "en", 20L),
      (2L, null, "de", 5L), (3L, "   ", "xx", -1L),
      (null, "gamma", null, 999L))
      .toDF("id", "text", "lang", "n")
    val got = report(QualityAudit.audit(rows, Seq(
      QualityAudit.rowCount(1L),
      QualityAudit.nullCount("id"),
      QualityAudit.duplicateCount("id"),
      QualityAudit.nullCount("text", maxNulls = 2L),
      QualityAudit.matchingCount("text", "^\\s*$", 0L, 0L),
      QualityAudit.setViolations("lang", Seq("en", "de")),
      QualityAudit.boundViolations("n", 0L, 100L),
      QualityAudit.distinctCount("lang", 2L, 2L))))
    assert(got(("row_count", "*")) == ((5L, true)))
    assert(got(("null_count", "id")) == ((1L, false)))       // 1 null > 0
    assert(got(("duplicate_count", "id")) == ((1L, false)))  // id=2 twice
    assert(got(("null_count", "text")) == ((1L, true)))      // <= 2 allowed
    assert(got(("matching_count", "text")) == ((1L, false))) // the blank doc
    assert(got(("set_violations", "lang")) == ((1L, false))) // xx (null exempt)
    assert(got(("bound_violations", "n")) == ((2L, false)))  // -1 and 999
    assert(got(("distinct_count", "lang")) == ((3L, false))) // en, de, xx
  }

  test("audit of an empty table yields zero counts, not nulls") {
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    val got = report(QualityAudit.audit(empty, Seq(
      QualityAudit.rowCount(0L, 0L),
      QualityAudit.distinctCount("id", 0L, 0L),
      QualityAudit.duplicateCount("id"))))
    assert(got.values.forall { case (obs, pass) => obs == 0L && pass })
  }

  test("referentialViolations counts unmatched and null FKs") {
    val fact = Seq[(java.lang.Long, String)]((1L, "a"), (2L, "b"), (7L, "c"),
      (null, "d")).toDF("fk", "payload")
    val dim = Seq(1L, 2L, 3L).toDF("pk")
    val row = QualityAudit.referentialViolations(fact, "fk", dim, "pk", max = 0L)
      .head()
    assert(row.getString(0) == "referential_violations")
    assert(row.getLong(2) == 2L && !row.getBoolean(5)) // fk=7 and fk=null
    val ok = QualityAudit.referentialViolations(
      fact.filter($"fk".isin(1L, 2L)), "fk", dim, "pk").head()
    assert(ok.getLong(2) == 0L && ok.getBoolean(5))
  }

  test("the union report schema lines up across audit and referential rows") {
    val fact = Seq((1L, "a")).toDF("fk", "payload")
    val dim = Seq(1L).toDF("pk")
    val u = QualityAudit.audit(fact, Seq(QualityAudit.rowCount(1L)))
      .unionAll(QualityAudit.referentialViolations(fact, "fk", dim, "pk"))
    assert(u.columns.toSeq ==
      Seq("check", "column", "observed", "lo", "hi", "pass"))
    assert(u.count() == 2)
  }
}
