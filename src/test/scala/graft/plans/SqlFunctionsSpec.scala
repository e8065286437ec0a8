package graft.plans

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The injected SQL functions must be callable from spark.sql and agree
  * with their Column-API counterparts.
  */
class SqlFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("graft_* functions are registered and correct in SQL") {
    val cos = spark.sql(
      "SELECT graft_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c")
      .head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)

    val norm = spark.sql(
      "SELECT graft_normalize_text('  Hello   WORLD ') AS n")
      .head().getString(0)
    assert(norm == "hello world")

    val jac = spark.sql(
      "SELECT graft_jaccard(array('a','b','c'), array('b','c','d')) AS j")
      .head().getDouble(0)
    assert(math.abs(jac - 0.5) < 1e-12)

    val sh = spark.sql(
      "SELECT graft_simhash(array('x','y')) = graft_simhash(array('x','y')) AS eq")
      .head().getBoolean(0)
    assert(sh)

    val dot = spark.sql(
      "SELECT graft_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d")
      .head().getDouble(0)
    assert(math.abs(dot - 11.0) < 1e-12)

    val nrm = spark.sql("SELECT graft_norm(array(3.0F, 4.0F)) AS n")
      .head().getDouble(0)
    assert(math.abs(nrm - 5.0) < 1e-12)
  }
}
