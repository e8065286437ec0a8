package graft.operators

import java.nio.file.Files

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Reliable-vs-local checkpoint parity: `spark.graft.reliableCheckpoints`
  * swaps executor-memory `localCheckpoint` for a reliable `checkpoint()`
  * write (executor-loss-safe on a real cluster) and must not change any
  * result of the iterative operators that cut lineage through
  * [[Lineage.cut]].
  */
class LineageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withReliable[A](body: => A): A = {
    val dir = Files.createTempDirectory("graft-reliable-ckpt").toFile
    dir.deleteOnExit()
    spark.conf.set(Lineage.ReliableConf, "true")
    spark.conf.set(Lineage.DirConf, dir.getAbsolutePath)
    spark.sparkContext.setCheckpointDir(dir.getAbsolutePath)
    try body
    finally spark.conf.unset(Lineage.ReliableConf)
  }

  // long enough that the i % 3 == 0 mid-iteration cut fires
  private val edges = Seq(
    ("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "a"),
    ("e", "a"), ("e", "b"), ("f", "c")).toDF("s", "t")

  test("integerPageRank: identical ranks under local and reliable checkpoints") {
    val local = Graph.integerPageRank(edges, "s", "t", iters = 7)
      .as[(String, Long)].collect().sorted.toSeq
    val reliable = withReliable {
      Graph.integerPageRank(edges, "s", "t", iters = 7)
        .as[(String, Long)].collect().sorted.toSeq
    }
    assert(local == reliable)
    assert(local.nonEmpty)
  }

  test("duplicateGroups: identical components under local and reliable checkpoints") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (4L, 5L), (6L, 7L), (7L, 8L), (8L, 9L))
      .toDF("id_a", "id_b")
    def run() = Dedup.duplicateGroups(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().sorted.toSeq
    val local = run()
    val reliable = withReliable(run())
    assert(local == reliable)
    assert(local.nonEmpty)
  }

  test("localCheckpointLevel knob: blocks stored at the requested level, " +
      "results unchanged") {
    import org.apache.spark.storage.StorageLevel
    def run() = Dedup.duplicateGroups(
      Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b"),
      "id_a", "id_b").as[(Long, Long)].collect().sorted.toSeq
    val default = run()
    spark.conf.set(Lineage.LevelConf, "MEMORY_AND_DISK_SER")
    try {
      val cut = Lineage.cut(Seq(1L, 2L, 3L).toDF("v"))
      cut.count()
      // the cut frame's RDD lineage ends in a LocalCheckpointRDD family
      // whose live blocks carry the configured level
      val lvl = cut.rdd.getStorageLevel
      assert(lvl == StorageLevel.MEMORY_AND_DISK_SER ||
        // rdd() wraps in a deserialize step; fall back to asserting via
        // the persisted RDDs registry
        spark.sparkContext.getPersistentRDDs.values
          .exists(_.getStorageLevel == StorageLevel.MEMORY_AND_DISK_SER),
        s"no MEMORY_AND_DISK_SER blocks found (outer level was $lvl)")
      assert(run() == default) // storage level must never change answers
    } finally spark.conf.unset(Lineage.LevelConf)
  }
}
