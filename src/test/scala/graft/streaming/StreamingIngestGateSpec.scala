package graft.streaming

import graft.TestSpark
import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Laws for the streaming near-dup ingest gate:
  *  1. STREAM == BATCH REPLAY — driving the gate through Structured
  *     Streaming epochs leaves exactly the corpus + index state of calling
  *     the batch pieces epoch-by-epoch by hand;
  *  2. cross-epoch rejection — a later epoch's near-dup of an EARLIER
  *     epoch's acceptance is rejected (the index accumulates);
  *  3. the index keeps its (band, bhash) bucket layout across any number
  *     of epoch appends (zero-Exchange bucket-key aggregation);
  *  4. re-delivered epochs are corpus-idempotent (exact self-match
  *     rejection).
  */
class StreamingIngestGateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val N = 3; private val K = 64; private val B = 16
  private val THR = 0.8

  // 40-word documents: a single-word edit shares 35 of 41 distinct
  // 3-gram shingles (jaccard ≈ 0.854 ≥ 0.8 → a true near-dup), while a
  // 13-word doc with one edit sits at ≈ 0.57 — length matters for the
  // threshold, so the fixture is built long deliberately
  private def words(tag: String) = (1 to 40).map(i => s"$tag$i")
  private def fresh(tag: String) = words(tag).mkString(" ")
  private def nearDup(tag: String, at: Int) =
    words(tag).updated(at, "edited").mkString(" ")

  private val epoch1 = Seq(
    (1L, fresh("alpha")), (2L, fresh("beta")), (3L, fresh("gamma")))
  // 11 = near-dup of 1 (one word edited), 12 = fresh
  private val epoch2 = Seq((11L, nearDup("alpha", 19)), (12L, fresh("delta")))
  // 21 = near-dup of EPOCH-2's acceptance 12, 22 = fresh
  private val epoch3 = Seq((21L, nearDup("delta", 5)), (22L, fresh("omega")))

  private def drop(tables: String*): Unit = tables.foreach { t =>
    spark.sql(s"DROP TABLE IF EXISTS `$t`")
    // a dropped-but-orphaned managed location makes the next saveAsTable
    // refuse table creation — clear it like SimilaritySearch's build does
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      t.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  private def runStream(prefix: String,
                        epochs: Seq[Seq[(Long, String)]]): Unit = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val ckpt = Files.createTempDirectory("graft-gate").toString
    val q = StreamingIngestGate.start(mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text", s"${prefix}_corpus", s"${prefix}_index",
      N, K, B, THR, ckpt)()
    try epochs.foreach { e => mem.addData(e: _*); q.processAllAvailable() }
    finally q.stop()
  }

  private def corpusIds(table: String): Set[Long] =
    spark.table(table).select(col("doc_id").cast("long"))
      .as[Long].collect().toSet

  test("stream == batch replay; cross-epoch rejection; bucket layout survives") {
    drop("gate_s_corpus", "gate_s_index", "gate_b_corpus", "gate_b_index")
    val epochs = Seq(epoch1, epoch2, epoch3)
    runStream("gate_s", epochs)
    // manual batch-by-batch replay through the same per-epoch body
    epochs.foreach { e =>
      StreamingIngestGate.gateBatch(e.toDF("doc_id", "text"), "doc_id",
        "text", "gate_b_corpus", "gate_b_index", N, K, B, THR)
        .unpersist(blocking = false)
    }
    val s = corpusIds("gate_s_corpus"); val b = corpusIds("gate_b_corpus")
    assert(s == b, s"stream corpus $s != batch-replay corpus $b")
    // near-dups of prior ACCEPTANCES rejected, fresh docs accepted —
    // including 21, a near-dup of epoch 2's acceptance (the index grew)
    assert(s == Set(1L, 2L, 3L, 12L, 22L))
    // index rows == banding of exactly the accepted docs
    val idxDocs = spark.table("gate_s_index").select(col("doc").cast("long"))
      .distinct().as[Long].collect().toSet
    assert(idxDocs == s)
    // bucket layout: zero-Exchange agg on the bucket keys after 3 appends
    val agg = spark.table("gate_s_index").groupBy("band", "bhash").count()
    agg.write.format("noop").mode("overwrite").save()
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
      "(band, bhash) agg must stay shuffle-free across epoch appends")
  }

  test("re-delivered epoch is corpus-idempotent (exact self-match rejection)") {
    drop("gate_r_corpus", "gate_r_index")
    Seq(epoch1, epoch2).foreach { e =>
      StreamingIngestGate.gateBatch(e.toDF("doc_id", "text"), "doc_id",
        "text", "gate_r_corpus", "gate_r_index", N, K, B, THR)
        .unpersist(blocking = false)
    }
    val before = corpusIds("gate_r_corpus")
    // at-least-once: epoch 2 delivered again
    StreamingIngestGate.gateBatch(epoch2.toDF("doc_id", "text"), "doc_id",
      "text", "gate_r_corpus", "gate_r_index", N, K, B, THR)
      .unpersist(blocking = false)
    assert(corpusIds("gate_r_corpus") == before,
      "replayed docs must exact-match themselves in the index and be rejected")
    assert(spark.table("gate_r_index").select("doc").distinct().count() ==
      before.size.toLong)
  }
}
