package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Main-level spec of the `watch --ingest-gate` CLI plane: the exact flag
  * array an operator would pass drives [[IngestCli.start]] (the same code
  * path `Main.main` runs, minus the session lifecycle the shared test
  * session can't survive) over a real file-stream directory, one json
  * file per epoch, and the resulting canonical map must equal the
  * full-batch recompute over the accepted corpus — the stream == batch
  * law, reached purely through CLI wiring. The packaged spark-submit path
  * is additionally smoked by scripts/ingest_smoke.sh (the Dockerfile
  * pattern).
  */
class MainIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // the ingest fixture family: 40-word docs, 1 edit = jaccard 0.854
  // (gate-rejected at 0.8), 2 edits = 0.727 (accepted, grouped at 0.7)
  private def words(tag: String) = (1 to 40).map(i => s"$tag$i")
  private def fresh(tag: String) = words(tag).mkString(" ")
  private def edited(tag: String, at: Int*) =
    at.foldLeft(words(tag)) { (w, i) => w.updated(i, s"edited$i") }
      .mkString(" ")

  private def drop(tables: String*): Unit = tables.foreach { t =>
    spark.sql(s"DROP TABLE IF EXISTS `$t`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      t.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  test("watch --ingest-gate flags drive the composed loop end-to-end; " +
    "map == batch recompute; --once summary line") {
    val all = Seq("mcli_corpus", "mcli_index", "mcli_map",
      "mcli_map_epochs", "mcli_map_foldlog")
    drop(all: _*)
    val in = Files.createTempDirectory("graft-mcli-in")
    val ckpt = Files.createTempDirectory("graft-mcli-ckpt").toString
    def json(id: Long, text: String) = s"""{"doc_id":$id,"text":"$text"}"""
    val args = Array("watch", "--ingest-gate",
      "--in", in.toString, "--checkpoint", ckpt,
      "--corpus-table", "mcli_corpus", "--index-table", "mcli_index",
      "--map-table", "mcli_map",
      "--gate-threshold", "0.8", "--map-threshold", "0.7",
      "--shingle-n", "3", "--minhash-k", "64", "--bands", "16",
      "--nbuckets", "4", "--npartitions", "4", "--once")
    val q = IngestCli.start(spark, args)
    try {
      // epoch 1 founds; epoch 2: 11 accepted+grouped with 1, 13 rejected
      Files.write(Paths.get(in.toString, "e1.json"), java.util.List.of(
        json(1L, fresh("alpha")), json(2L, fresh("beta"))))
      q.processAllAvailable()
      Files.write(Paths.get(in.toString, "e2.json"), java.util.List.of(
        json(11L, edited("alpha", 10, 25)), json(13L, edited("alpha", 19))))
      q.processAllAvailable()
    } finally q.stop()
    val corpus = spark.table("mcli_corpus")
    assert(corpus.select(col("doc_id").cast("long")).as[Long].collect()
      .toSet == Set(1L, 2L, 11L))
    val got = spark.table("mcli_map")
      .select(col("doc_id").cast("long"), col("canonical_id").cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 11L -> 1L))
    // THE LAW through the CLI path: map == full-batch recompute
    val oracle = Dedup.duplicateGroups(
      Dedup.minhashLshPairs(corpus, "doc_id", "text", 3, 64, 16, 0.7),
      "doc_a", "doc_b")
      .select(col("doc_id").cast("long"), col("canonical_id").cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(got == oracle)
    // the --once summary an operator (and the smoke script) reads
    assert(IngestCli.summary(spark, args) ==
      "ingest-gate: corpus=3 docs, map=2 rows")
    drop(all: _*)
  }

  test("flag validation: missing required flag and inverted thresholds " +
    "fail fast with named errors") {
    val base = Array("watch", "--ingest-gate", "--in", "/tmp/x",
      "--checkpoint", "/tmp/c", "--corpus-table", "c",
      "--index-table", "i", "--map-table", "m")
    val e1 = intercept[IllegalArgumentException] {
      IngestCli.start(spark, base.dropRight(2)) // no --map-table
    }
    assert(e1.getMessage.contains("--map-table"))
    val e2 = intercept[IllegalArgumentException] {
      IngestCli.start(spark, base ++ Array(
        "--gate-threshold", "0.7", "--map-threshold", "0.8"))
    }
    assert(e2.getMessage.contains("--map-threshold must be <="))
  }
}
