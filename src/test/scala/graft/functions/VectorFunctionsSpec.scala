package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Custom Catalyst expressions vs independent implementations. */
class VectorFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("codegen cosine matches builtin higher-order-function cosine") {
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(50)((
      Array.fill(16)(rnd.nextFloat() * 2 - 1),
      Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("a", "b")
      .withColumn("fast", VectorFunctions.cosine(col("a"), col("b")))
      .withColumn("ref", VectorFunctions.cosineBuiltin(
        col("a").cast("array<double>"), col("b").cast("array<double>")))
    val rows = df.select("fast", "ref").as[(Double, Double)].collect()
    rows.foreach { case (f, r) => assert(math.abs(f - r) < 1e-12, s"$f vs $r") }
  }

  test("cosine of identical vectors is 1, opposite is -1, zero vector is 0") {
    val df = Seq(
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f)),
      (Array(1f, 0f, -2f), Array(-1f, 0f, 2f)),
      (Array(0f, 0f, 0f), Array(1f, 2f, 3f)))
      .toDF("a", "b")
      .select(VectorFunctions.cosine(col("a"), col("b")).as("c"))
    val out = df.as[Double].collect().toSeq
    assert(math.abs(out(0) - 1.0) < 1e-12)
    assert(math.abs(out(1) + 1.0) < 1e-12)
    assert(out(2) == 0.0)
  }

  test("dot/norm factorization agrees with cosine") {
    val rnd = new scala.util.Random(9)
    val vecs = Seq.fill(50)((
      Array.fill(16)(rnd.nextFloat() * 2 - 1),
      Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val rows = vecs.toDF("a", "b")
      .select(
        (VectorFunctions.dot(col("a"), col("b")) /
          (VectorFunctions.norm(col("a")) * VectorFunctions.norm(col("b"))))
          .as("via_dot"),
        VectorFunctions.cosine(col("a"), col("b")).as("direct"))
      .as[(Double, Double)].collect()
    rows.foreach { case (d, c) => assert(math.abs(d - c) < 1e-12, s"$d vs $c") }
  }

  test("simhash: identical token arrays → distance 0; near-identical → small") {
    val base = (1 to 40).map(i => s"tok$i")
    val df = Seq(
      (base, base),
      (base, base.updated(3, "CHANGED")),
      (base, (1 to 40).map(i => s"other$i")))
      .toDF("x", "y")
      .select(bit_count(VectorFunctions.simhash(col("x"))
        .bitwiseXOR(VectorFunctions.simhash(col("y")))).as("d"))
      .as[Int].collect().toSeq
    assert(df(0) == 0)
    assert(df(1) < 16, s"near-identical drifted ${df(1)} bits")
    assert(df(2) > 10, s"unrelated only ${df(2)} bits apart")
  }

  test("minhash signature estimates jaccard (statistical, k=256)") {
    // two sets with known jaccard 50/150 = 1/3
    val a = (1 to 100).map(i => s"s$i")
    val b = (51 to 150).map(i => s"s$i")
    val df = Seq((a, b)).toDF("a", "b").select(
      VectorFunctions.minhashSig(col("a"), 256).as("sa"),
      VectorFunctions.minhashSig(col("b"), 256).as("sb"))
    val (sa, sb) = df.as[(Seq[Long], Seq[Long])].head()
    val est = sa.zip(sb).count { case (x, y) => x == y } / 256.0
    assert(math.abs(est - 1.0 / 3.0) < 0.12, s"estimate $est")
  }

  test("kernels are deterministic across invocations and rows") {
    val toks = Seq("a", "b", "c").toDF("t")
      .agg(collect_list("t").as("ts"))
      .select(VectorFunctions.simhash(col("ts")),
        VectorFunctions.minhashSig(col("ts"), 8),
        VectorFunctions.hyperplaneSketch(lit(Array(0.5f, -0.25f)), 8))
    assert(toks.collect().toSeq == toks.collect().toSeq)
  }

  // Independent reimplementation of the md5-60bit hash contract:
  // CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT) on the oracle side.
  private def md5hash60Ref(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("simhashMd5 matches a from-scratch md5-vote reference") {
    val docs = Seq("the quick brown fox", "lorem ipsum dolor sit amet", "a")
    val got = docs.toDF("text")
      .select(VectorFunctions.simhashMd5(TextFunctions.tokens(col("text"))))
      .as[Long].collect()
    val want = docs.map { doc =>
      val votes = new Array[Int](60)
      doc.trim.split("\\s+").foreach { t =>
        val h = md5hash60Ref(t)
        for (j <- 0 until 60)
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
      }
      (0 until 60).foldLeft(0L)((acc, j) =>
        if (votes(j) > 0) acc | (1L << j) else acc)
    }
    assert(got.toSeq == want)
    // 60-bit: top nibble always clear
    got.foreach(fp => assert((fp >>> 60) == 0L))
  }

  test("winnowMd5 matches a from-scratch window-min reference") {
    val n = 3; val w = 4
    val docs = Seq(
      (1 to 20).map(i => s"t${i % 7}").mkString(" "), // repeats → dedupe
      "only two",                                     // m < n: single gram
      "a b c d e f")                                  // eff=4 == w: one window
    val got = docs.toDF("text")
      .select(VectorFunctions.winnowMd5(TextFunctions.tokens(col("text")), n, w))
      .as[Seq[Long]].collect()
    val want = docs.map { doc =>
      val toks = doc.trim.split("\\s+")
      val eff = math.max(1, toks.length - n + 1)
      val hs = (0 until eff).map(s =>
        md5hash60Ref(toks.slice(s, s + n).mkString(" ")))
      val mins =
        if (eff <= w) Seq(hs.min)
        else (0 to eff - w).map(s => hs.slice(s, s + w).min)
      mins.distinct
    }
    got.zip(want).foreach { case (g, e) => assert(g.toSet == e.toSet) }
  }
}
