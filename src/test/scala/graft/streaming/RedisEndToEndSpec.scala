package graft.streaming

import graft.TestSpark
import graft.cdc.{CdcConfig, Routing}
import graft.sources.{InMemoryRedis, RedisId}
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end watch topology with Redis on BOTH ends — the engine's mirror
  * of the reference's `testWatchCommandDeduplicate*` integration tests
  * (WatchTests.java:96-157): push Debezium envelopes into per-table source
  * streams, run source → parse → fan-out → dedupe → batch → XADD sink, then
  * assert per-target stream contents, the O4 priming entry, the ack/delete
  * retention matrix on the source, and the ≤maxBatch id-array cap.
  */
class RedisEndToEndSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def envelope(id: Int): String =
    s"""{"before": null, "after": {"entity_id": $id}}"""

  private var n = 0
  private def freshMem(): (String, InMemoryRedis) = {
    n += 1
    val name = s"e2e$n"
    InMemoryRedis.reset(name)
    (s"mem://$name", InMemoryRedis.named(name))
  }

  private def ckpt(): String =
    java.nio.file.Files.createTempDirectory("graft-e2e-ckpt").toString

  /** The reference's config shape: one watched table fanning out to two
    * targets (config.yaml mapping, WatchTests' fixtures).
    */
  private def config(ack: String, maxBatch: Int = 1000): CdcConfig =
    CdcConfig.parse(
      s"""{"source": {"prefix": "m2.", "group": "cdc", "acknowledge": "$ack"},
         |"target": {"prefix": "target."},
         |"buffers": {"target": {"size": $maxBatch, "time": 1000}},
         |"mapping": {"catalog_category_entity": {"entity_id":
         |  ["catalog_product_flat", "catalog_category_product"]}}}""".stripMargin,
      yaml = false)

  /** Source stream + sink stream contents for one full watch run. */
  private def runWatch(url: String, mem: InMemoryRedis, cfg: CdcConfig): Unit = {
    val records = spark.readStream.format("graft-redis")
      .option("url", url)
      .option("streams", cfg.mapping.keys.toSeq.sorted
        .map(t => s"${cfg.source.prefix}$t").mkString(","))
      .option("group", cfg.source.group)
      .option("prefix", cfg.source.prefix)
      .option("acknowledge", cfg.source.acknowledge)
      .load()
    RedisStreamsSink.prime(url, cfg.target.prefix, cfg.routes.map(_.target).distinct)
    val q = CdcStream.startWith(records, Routing.routesDf(spark, cfg),
      cfg.buffers.target.size, ckpt(), windowMillis = 100L)(
      RedisStreamsSink.writer(url, cfg.target.prefix))
    try {
      q.processAllAvailable()
      // epoch N's source ack fires when epoch N+1 plans; poke an empty epoch
      mem.xadd("m2.catalog_category_entity", Seq("v" -> envelope(-1)))
      q.processAllAvailable()
      q.processAllAvailable()
    } finally q.stop()
  }

  private def idArrays(mem: InMemoryRedis, stream: String): Seq[String] =
    mem.xrange(stream, RedisId.Zero, RedisId(-1L, -1L), Int.MaxValue)
      .map(_._2("ids"))

  test("watch: dedupe 1,2,1,2 → one [1,2] per target; priming entry first; delete-mode trims source") {
    val (url, mem) = freshMem()
    // the reference's canonical fixture (WatchTests.java:113-127)
    Seq(1, 2, 1, 2).foreach(i =>
      mem.xadd("m2.catalog_category_entity", Seq("v" -> envelope(i))))
    runWatch(url, mem, config(ack = "delete"))

    for (t <- Seq("target.catalog_product_flat", "target.catalog_category_product")) {
      val entries = idArrays(mem, t)
      assert(entries.head == "[]", s"$t missing O4 priming entry")
      assert(entries.tail.contains("[1,2]"),
        s"$t must carry the deduped [1,2] batch, got $entries")
    }
    // delete-mode retention: acked source entries XDELed (the poke entry and
    // at most the final unacked epoch may remain — WatchTests asserts 0 after
    // full drain; our ack lags one epoch by design, A1 analogue)
    val deadline = System.currentTimeMillis() + 10000
    while (System.currentTimeMillis() < deadline &&
           mem.xlen("m2.catalog_category_entity") > 1) Thread.sleep(100)
    assert(mem.xlen("m2.catalog_category_entity") <= 1L,
      "acked source entries must be XDELed in delete mode")
  }

  test("watch: simple mode XACKs but retains source entries") {
    val (url, mem) = freshMem()
    Seq(1, 2).foreach(i =>
      mem.xadd("m2.catalog_category_entity", Seq("v" -> envelope(i))))
    runWatch(url, mem, config(ack = "simple"))
    assert(mem.xlen("m2.catalog_category_entity") == 3L, // 2 + poke
      "simple mode must not XDEL")
    val deadline = System.currentTimeMillis() + 10000
    while (System.currentTimeMillis() < deadline &&
           mem.ackedIds("m2.catalog_category_entity", "cdc").size < 2)
      Thread.sleep(100)
    assert(mem.ackedIds("m2.catalog_category_entity", "cdc").size >= 2,
      "source entries must be XACKed into the group")
    assert(idArrays(mem, "target.catalog_product_flat").contains("[1,2]"))
  }

  test("watch: id arrays capped at maxBatch (reference's ≤1000, README:7)") {
    val (url, mem) = freshMem()
    (1 to 7).foreach(i =>
      mem.xadd("m2.catalog_category_entity", Seq("v" -> envelope(i))))
    runWatch(url, mem, config(ack = "simple", maxBatch = 3))
    val entries = idArrays(mem, "target.catalog_product_flat").filter(_ != "[]")
    val sizes = entries.map(e =>
      if (e == "[]") 0 else e.stripPrefix("[").stripSuffix("]").split(",").length)
    assert(sizes.nonEmpty && sizes.forall(_ <= 3), s"chunk cap violated: $entries")
    val all = entries.flatMap(e =>
      e.stripPrefix("[").stripSuffix("]").split(",").map(_.toInt))
    assert(all.toSet.intersect((1 to 7).toSet) == (1 to 7).toSet,
      s"every id must be delivered, got $all")
  }

  test("watch: chunks arrive in per-target chunk order") {
    val (url, mem) = freshMem()
    (1 to 9).foreach(i =>
      mem.xadd("m2.catalog_category_entity", Seq("v" -> envelope(i))))
    runWatch(url, mem, config(ack = "simple", maxBatch = 2))
    val entries = idArrays(mem, "target.catalog_category_product")
      .filter(e => e != "[]" && e != "[-1]")
    // deterministic ordered chunker + sorted single-task append per target:
    // first ids of consecutive chunks must be increasing
    val firsts = entries.map(
      _.stripPrefix("[").stripSuffix("]").split(",").head.toInt)
    assert(firsts == firsts.sorted, s"chunks out of order: $entries")
  }
}
