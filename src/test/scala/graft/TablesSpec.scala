package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Guards the table-loading layer against testdata schema drift.
  *
  * Round 6 lost 23 queries when the driver regenerated `events.parquet` with
  * TIMESTAMP_MICROS `isAdjustedToUTC=0` (read as TIMESTAMP_NTZ) instead of the
  * old TIMESTAMP(NANOS) layout: `Tables.normalizeEventTs` only handled the
  * nanos-as-long shape. These specs pin BOTH layouts via crafted parquet and
  * assert the live testdata loads across every SF dir, so the next
  * regeneration fails loudly in one named suite instead of 27 scattered ones.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeAndLoadEvents(build: => org.apache.spark.sql.DataFrame) = {
    val dir = Files.createTempDirectory("graft-tables-spec").toFile
    dir.deleteOnExit()
    build.write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/events.parquet")
    Tables(spark, dir.getAbsolutePath, "events")
  }

  // 2024-01-01T00:00:01.500001 UTC
  private val wallMicros = 1704067201500001L

  test("events with TIMESTAMP_NTZ micros ts (isAdjustedToUTC=0) normalizes") {
    val loaded = writeAndLoadEvents {
      spark.range(1).select(
        expr(s"make_timestamp_ntz(2024, 1, 1, 0, 0, 1.500001)").as("ts"),
        lit(42L).as("user_id"))
    }
    assert(loaded.schema("ts").dataType == TimestampType)
    assert(loaded.schema("ts_ns").dataType == LongType)
    val row = loaded.select(unix_micros(col("ts")), col("ts_ns")).head()
    // UTC session tz: the cast preserves wall-clock micros bit-for-bit
    assert(row.getLong(0) == wallMicros)
    assert(row.getLong(1) == wallMicros * 1000L)
  }

  test("events with nanos-as-long ts normalizes (legacy TIMESTAMP(NANOS) layout)") {
    val nanos = wallMicros * 1000L + 789L // sub-microsecond tail survives in ts_ns
    val loaded = writeAndLoadEvents {
      Seq((nanos, 42L)).toDF("ts", "user_id")
    }
    assert(loaded.schema("ts").dataType == TimestampType)
    assert(loaded.schema("ts_ns").dataType == LongType)
    val row = loaded.select(unix_micros(col("ts")), col("ts_ns")).head()
    assert(row.getLong(0) == wallMicros) // integer div truncates the 789ns tail
    assert(row.getLong(1) == nanos)
  }

  test("events with TIMESTAMP_LTZ micros ts (isAdjustedToUTC=1) normalizes") {
    val loaded = writeAndLoadEvents {
      spark.range(1).select(
        timestamp_micros(lit(wallMicros)).as("ts"),
        lit(42L).as("user_id"))
    }
    val row = loaded.select(unix_micros(col("ts")), col("ts_ns")).head()
    assert(row.getLong(0) == wallMicros)
    assert(row.getLong(1) == wallMicros * 1000L)
  }

  test("every driver table loads in every SF dir; events exposes ts + ts_ns") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      for (name <- Tables.names) {
        val df = Tables(spark, dir, name)
        assert(df.schema.nonEmpty, s"$sf/$name has an empty schema")
        if (name == "events") {
          assert(df.schema("ts").dataType == TimestampType,
            s"$sf/events.ts must normalize to TIMESTAMP, got ${df.schema("ts").dataType}")
          assert(df.schema("ts_ns").dataType == LongType,
            s"$sf/events.ts_ns must be LONG, got ${df.schema("ts_ns").dataType}")
        }
      }
      // one cheap action per dir so a corrupt file fails here, not downstream
      assert(Tables(spark, dir, "events").limit(1).count() == 1L)
    }
  }

  test("drift-prone schemas are pinned: embeddings vector type, documents columns") {
    import org.apache.spark.sql.types.{ArrayType, FloatType, StringType}
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      // every vector kernel (cosine, sketches, centroids) reads float
      // elements; a regeneration to array<double> must fail HERE by name
      val emb = Tables(spark, dir, "embeddings")
      assert(emb.schema("embedding").dataType == ArrayType(FloatType, true) ||
        emb.schema("embedding").dataType == ArrayType(FloatType, false),
        s"$sf/embeddings.embedding must be array<float>, " +
          s"got ${emb.schema("embedding").dataType}")
      assert(emb.schema("vec_id").dataType == LongType)
      val docs = Tables(spark, dir, "documents")
      for (c <- Seq("text", "lang", "source"))
        assert(docs.schema(c).dataType == StringType,
          s"$sf/documents.$c must be string, got ${docs.schema(c).dataType}")
      assert(docs.schema("doc_id").dataType == LongType)
    }
  }
}
