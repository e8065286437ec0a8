package graft.cdc

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic laws of the dedupe/batch stages, checked across ScalaCheck-
  * generated inputs (multiple fixed seeds — deterministic, Spark-job-bounded).
  */
class DedupeLawsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val genRows: Gen[List[(String, Int, Long)]] = for {
    n <- Gen.choose(1, 300)
    rows <- Gen.listOfN(n, for {
      t <- Gen.oneOf("t1", "t2", "t3")
      id <- Gen.choose(0, 40)
      ord <- Gen.choose(0L, 10000L)
    } yield (t, id, ord))
  } yield rows

  private def samples: Seq[List[(String, Int, Long)]] =
    (1 to 8).flatMap { seed =>
      genRows(Gen.Parameters.default, rng.Seed(seed.toLong)).toSeq
    }

  test("law: keep-first dedupe is idempotent") {
    samples.foreach { rows =>
      val df = rows.toDF("target", "entity_id", "ord")
      val once = Dedupe.keepFirstAgg(df, Seq("target", "entity_id"), col("ord"), Seq("ord"))
      val twice = Dedupe.keepFirstAgg(once, Seq("target", "entity_id"), col("ord"), Seq("ord"))
      assert(twice.collect().toSet == once.collect().toSet)
    }
  }

  test("law: survivor is the min-order row per key; one row per distinct key") {
    samples.foreach { rows =>
      val df = rows.toDF("target", "entity_id", "ord")
      val got = Dedupe.keepFirstAgg(df, Seq("target", "entity_id"), col("ord"), Seq("ord"))
        .as[(String, Int, Long)].collect().toSet
      val expect = rows.groupBy(r => (r._1, r._2)).map { case ((t, id), g) =>
        (t, id, g.map(_._3).min)
      }.toSet
      assert(got == expect)
    }
  }

  test("law: agg and window keep-first strategies agree") {
    samples.foreach { rows =>
      val df = rows.toDF("target", "entity_id", "ord")
      val viaAgg = Dedupe.keepFirstAgg(df, Seq("target", "entity_id"), col("ord"), Seq("ord"))
        .select("target", "entity_id", "ord").as[(String, Int, Long)].collect().toSet
      val viaWin = Dedupe.keepFirstRows(df, Seq("target", "entity_id"), col("ord"))
        .select("target", "entity_id", "ord").as[(String, Int, Long)].collect().toSet
      assert(viaAgg == viaWin)
    }
  }

  test("law: chunking conserves ids, bounds chunk size, never mixes targets") {
    samples.foreach { rows =>
      val deduped = rows.groupBy(r => (r._1, r._2)).map { case ((t, id), g) =>
        (t, id, g.map(_._3).min)
      }.toList
      val df = deduped.toDF("target", "entity_id", "ord")
      val maxSize = 7
      val out = Batcher.chunkIds(df, "target", "entity_id", maxSize, col("ord"))
        .select("target", "ids", "n_ids")
        .as[(String, String, Long)].collect()
      assert(out.forall(_._3 <= maxSize))
      val idsByTarget = out.groupBy(_._1).view.mapValues(_.flatMap(r =>
        r._2.stripPrefix("[").stripSuffix("]") match {
          case "" => Nil
          case s => s.split(",").map(_.toInt).toSeq
        }).sorted.toSeq).toMap
      val expectByTarget = deduped.groupBy(_._1).view
        .mapValues(_.map(_._2).sorted.toSeq).toMap
      assert(idsByTarget == expectByTarget)
      // n_ids consistency with serialized payload
      out.foreach { case (_, ids, n) =>
        val k = if (ids == "[]") 0 else ids.count(_ == ',') + 1
        assert(k == n)
      }
    }
  }

  test("law: hashed chunking conserves ids and stays within nChunks") {
    samples.foreach { rows =>
      val deduped = rows.groupBy(r => (r._1, r._2)).keys.toList
      val df = deduped.toDF("target", "entity_id")
      val out = Batcher.chunkIdsHashed(df, "target", "entity_id", nChunks = 4)
        .select("target", "chunk_no", "ids")
        .as[(String, Long, String)].collect()
      assert(out.forall(r => r._2 >= 0 && r._2 < 4))
      val idsByTarget = out.groupBy(_._1).view.mapValues(_.flatMap(r =>
        r._3.stripPrefix("[").stripSuffix("]") match {
          case "" => Nil
          case x => x.split(",").map(_.toInt).toSeq
        }).sorted.toSeq).toMap
      val expect = deduped.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
      assert(idsByTarget == expect)
    }
  }

  test("law: distinctKeys equals the set of distinct key tuples") {
    samples.take(3).foreach { rows =>
      val df = rows.toDF("target", "entity_id", "ord")
      val got = Dedupe.distinctKeys(df, Seq("target", "entity_id"))
        .as[(String, Int)].collect().toSet
      assert(got == rows.map(r => (r._1, r._2)).toSet)
    }
  }
}
