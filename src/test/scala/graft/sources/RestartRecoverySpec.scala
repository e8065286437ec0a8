package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Crash/restart semantics: a new query over the SAME checkpoint resumes
  * from the committed offset — consumed segments are not re-read (no
  * duplicate emission), new segments are. This is the guarantee the
  * reference lacks (its unused recovery knobs, RedisSource.java:29-34:
  * crashed pending entries are never re-claimed; SURVEY §2.1 S4).
  */
class RestartRecoverySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def envelope(id: Int): String =
    s"""{"before": null, "after": {"entity_id": $id}}"""

  private def writeSegment(dir: String, seq: Long, ids: Seq[Int]): Unit =
    Files.write(Paths.get(dir, s"tbl.$seq.log"),
      ids.map(envelope).mkString("\n").getBytes("UTF-8"))

  test("restart from checkpoint resumes after consumed segments") {
    val dir = Files.createTempDirectory("graft-restart").toString
    val ckpt = Files.createTempDirectory("graft-restart-ckpt").toString
    val out = scala.collection.mutable.ArrayBuffer[String]()
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-cdc").option("path", dir).load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val ids = b.select("id").collect().map(_.getString(0))
          out.synchronized { out ++= ids }
          ()
        }
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    def rid(seq: Long, line: Long) = CdcDirectorySource.recordId(seq, line)
    writeSegment(dir, 1L, Seq(1, 2))
    runOnce() // "crash" = stop after commit
    assert(out.sorted.toSeq == Seq(rid(1, 0), rid(1, 1)))

    writeSegment(dir, 2L, Seq(3))
    runOnce() // restart over the same checkpoint
    // segment 1 NOT re-read; segment 2 picked up exactly once
    assert(out.sorted.toSeq == Seq(rid(1, 0), rid(1, 1), rid(2, 0)))
  }
}
