package graft.sources

import graft.TestSpark
import graft.cdc.CdcPipeline
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** DSv2 source e2e: segment discovery, incremental offsets, epoch commit
  * with delete-mode retention (the XACK+XDEL analogue), and the full CDC
  * plane running on top — the streaming port of the reference's
  * testWatchCommandDeduplicateCompact (WatchTests.java:96-157).
  */
class CdcDirectorySourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def envelope(id: Int): String =
    s"""{"before": null, "after": {"entity_id": $id}}"""

  private def writeSegment(dir: String, table: String, seq: Long, ids: Seq[Int]): Unit =
    Files.write(Paths.get(dir, s"$table.$seq.log"),
      ids.map(envelope).mkString("\n").getBytes("UTF-8"))

  private val routes = Seq(
    ("catalog_category_entity", "entity_id", "catalog_product_flat"),
    ("catalog_category_entity", "entity_id", "catalog_category_product"))

  test("reads segments incrementally; delete-mode commit trims acked segments") {
    val dir = Files.createTempDirectory("graft-src").toString
    val ckpt = Files.createTempDirectory("graft-src-ckpt").toString
    // canonical 1,2,1,2 fixture split over two segments
    writeSegment(dir, "catalog_category_entity", 1L, Seq(1, 2))
    writeSegment(dir, "catalog_category_entity", 2L, Seq(1, 2))

    val records = spark.readStream.format("graft-cdc")
      .option("path", dir).option("acknowledge", "delete").load()
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val q = records.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = CdcPipeline.run(batch, routes.toDF("table", "column", "target"),
            maxBatch = 1000)
          .select("target", "ids").collect()
          .map(r => (r.getString(0), r.getString(1)))
        out.synchronized { out ++= rows }
        ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      val afterFirst = out.synchronized(out.toSeq)
      // both segments land in the first batch -> one deduped [1,2] per target
      assert(afterFirst.toSet == Set(
        ("catalog_product_flat", "[1,2]"), ("catalog_category_product", "[1,2]")))

      // a later segment is picked up incrementally with its own dedupe window
      writeSegment(dir, "catalog_category_entity", 3L, Seq(2, 3, 3))
      q.processAllAvailable()
      val afterSecond = out.synchronized(out.toSeq).diff(afterFirst)
      assert(afterSecond.toSet == Set(
        ("catalog_product_flat", "[2,3]"), ("catalog_category_product", "[2,3]")))

      // source.commit fires when the NEXT batch executes (epoch N's ack is
      // delivered during epoch N+1, like the reference's delayed ack path
      // A1) -> batch 1 must have trimmed batch 0's segments 1 and 2
      val deadline = System.currentTimeMillis() + 10000
      while (System.currentTimeMillis() < deadline &&
             CdcDirectorySource.segments(dir).exists(_.seq <= 2L)) Thread.sleep(100)
      assert(CdcDirectorySource.segments(dir).forall(_.seq == 3L),
        "acked segments 1,2 not trimmed")
    } finally q.stop()
  }

  test("maxSegmentsPerTrigger (camelCase, as callers write it) caps each batch") {
    val dir = Files.createTempDirectory("graft-src3").toString
    val ckpt = Files.createTempDirectory("graft-src3-ckpt").toString
    (1L to 4L).foreach(seq => writeSegment(dir, "t", seq, Seq(seq.toInt)))
    val records = spark.readStream.format("graft-cdc")
      .option("path", dir).option("maxSegmentsPerTrigger", "1").load()
    val batchSizes = scala.collection.mutable.ArrayBuffer[Long]()
    val q = records.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = batch.count()
        batchSizes.synchronized { if (n > 0) batchSizes += n }
        ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
    // 4 segments under a 1-segment cap -> 4 micro-batches of 1 record each
    assert(batchSizes.synchronized(batchSizes.toSeq) == Seq(1L, 1L, 1L, 1L))
  }

  test("segment seq 0 is read; dotted table names parse on the last two dots") {
    val dir = Files.createTempDirectory("graft-src4").toString
    val ckpt = Files.createTempDirectory("graft-src4-ckpt").toString
    writeSegment(dir, "m2.m2.catalog_product_entity", 0L, Seq(7))
    assert(CdcDirectorySource.segments(dir)
      .map(s => (s.table, s.seq)) == Seq(("m2.m2.catalog_product_entity", 0L)))
    val records = spark.readStream.format("graft-cdc").option("path", dir).load()
    val seen = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val q = records.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.select("id", "table").collect()
          .map(r => (r.getString(0), r.getString(1)))
        seen.synchronized { seen ++= rows }
        ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(seen.synchronized(seen.toSeq) ==
      Seq((CdcDirectorySource.recordId(0L, 0L), "m2.m2.catalog_product_entity")))
  }

  test("record ids are fixed-width: string order == numeric arrival order") {
    assert(CdcDirectorySource.recordId(9L, 1L) < CdcDirectorySource.recordId(10L, 3L))
    assert(CdcDirectorySource.recordId(2L, 10L) > CdcDirectorySource.recordId(2L, 9L))
  }

  test("simple mode leaves consumed segments in place") {
    val dir = Files.createTempDirectory("graft-src2").toString
    val ckpt = Files.createTempDirectory("graft-src2-ckpt").toString
    writeSegment(dir, "catalog_category_entity", 1L, Seq(5))
    val records = spark.readStream.format("graft-cdc")
      .option("path", dir).load() // acknowledge defaults to "simple"
    var n = 0L
    val q = records.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        n += batch.count()
        ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(n == 1L)
    assert(CdcDirectorySource.segments(dir).map(_.seq) == Seq(1L))
  }
}
