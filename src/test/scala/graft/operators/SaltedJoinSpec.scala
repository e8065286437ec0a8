package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SaltedJoin must equal the plain equi-join bag-for-bag on skewed data. */
class SaltedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted inner join equals plain join on 90%-skewed keys") {
    val rnd = new scala.util.Random(9)
    // 90% of rows share key 7; plus keys with no match on the small side
    val big = (0 until 2000).map { i =>
      val k = if (rnd.nextInt(10) < 9) 7L else rnd.nextInt(20).toLong
      (k, i.toLong)
    }.toDF("k", "payload")
    val small = (0 until 15).map(k => (k.toLong, s"dim_$k")).toDF("k", "name")

    val plain = big.join(small, Seq("k")).select($"k", $"payload", $"name")
      .as[(Long, Long, String)].collect().sorted.toSeq
    val salted = SaltedJoin.inner(big, small, Seq("k"), salts = 8)
      .select($"k", $"payload", $"name")
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(salted == plain)
  }

  test("salts spread a constant key across partitions") {
    val big = (0 until 1000).map(i => (1L, i.toLong)).toDF("k", "payload")
    val nSalts = big.withColumn("_salt",
        pmod(xxhash64(col("k"), col("payload")), lit(8L)))
      .select("_salt").distinct().count()
    assert(nSalts > 4) // hash spreads even with a constant join key
  }
}
