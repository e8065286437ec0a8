package graft.streaming

import graft.TestSpark
import graft.cdc.Scd2
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streaming/batch equivalence law: feeding an arbitrary version stream
  * through [[StateCompaction]] in arbitrary batch splits must converge each
  * key to the same final state as batch [[Scd2.compact]] over all the data —
  * the property that makes incremental materialization trustworthy.
  */
class CompactionLawsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import StateCompaction.{Latest, Version}

  private val genVersions: Gen[List[Version]] = for {
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(0L, 8L)
      off <- Gen.choose(0L, 500L)
    } yield Version(k, off, s"p$k-$off"))
  } yield rows

  test("law: streamed compaction (any batch split) == batch compact of all data") {
    for (seed <- 1 to 4) {
      val versions = genVersions(Gen.Parameters.default, rng.Seed(seed.toLong)).get
      val cut = versions.length / 2
      val batches = Seq(versions.take(cut), versions.drop(cut)).filter(_.nonEmpty)

      implicit val sq = spark.sqlContext
      val mem = MemoryStream[Version]
      val out = scala.collection.mutable.ArrayBuffer[Latest]()
      val ckpt = Files.createTempDirectory("graft-complaw").toString
      val q = StateCompaction(mem.toDS())
        .writeStream.outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[Latest], _: Long) =>
          val rows = b.collect()
          out.synchronized { out ++= rows }
          ()
        }
        .trigger(Trigger.ProcessingTime(50L))
        .option("checkpointLocation", ckpt)
        .start()
      try {
        batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      } finally q.stop()

      // final streamed state: the LAST emission per key
      val streamedFinal = out.synchronized(out.toList)
        .groupBy(_.key).map { case (k, es) => k -> es.last.off }

      val batchFinal = Scd2.compact(versions.toDF(), Seq("key"), col("off"), Seq("off"))
        .as[(Long, Long)].collect().toMap
      assert(streamedFinal == batchFinal, s"seed=$seed")
    }
  }
}
