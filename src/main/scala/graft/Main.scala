package graft

import graft.cdc.{CdcConfig, DebeziumConfigGen, Routing}
import graft.streaming.{CdcStream, RedisStreamsSink}
import org.apache.spark.sql.types._

/** CLI — the engine's equivalent of the reference's Spring Shell commands
  * (Application.java + WatchStream.watch + DebeziumConfiguration.generate):
  *
  *   watch    --config <cfg> --in <dir-or-url> [--out <parquet-dir>]
  *            --checkpoint <dir> [--once] [--source graft-cdc|json|redis]
  *            [--sink parquet|redis] [--target-url <url>]
  *            runs the streaming CDC plane. Sources are pluggable on the
  *            shared `id, table, envelope` contract: the segment-directory
  *            source (CI default), a plain json file source, or the Redis
  *            Streams connector (`--source redis`, production parity with
  *            the reference's XREADGROUP/XACK/XDEL plane). Sinks: per-epoch
  *            parquet (default, needs --out) or the reference's XADD output
  *            plane (`--sink redis`, RedisStreamsSink, WatchStream.java
  *            :261-295).
  *   watch    --ingest-gate --in <docs-dir> --checkpoint <dir>
  *            --corpus-table <t> --index-table <t> --map-table <t>
  *            [--format json|parquet] [--gate-threshold 0.8]
  *            [--map-threshold 0.7] [--npartitions N] [--once] [...]
  *            runs the OTHER streaming plane: the composed daily-ingest
  *            loop (near-dup gate → index probe → partitioned
  *            canonical-map fold, [[IngestCli]]) — minhash index,
  *            accepted corpus, and canonical map maintained in lockstep
  *            at delta-proportional cost, crash-safe under at-least-once
  *            replay.
  *   generate --config <cfg>
  *            prints Debezium Server properties derived from the config.
  */
object Main {
  def main(args: Array[String]): Unit = args.headOption match {
    case Some("generate") =>
      val cfg = CdcConfig.load(opt(args, "--config").getOrElse("./config.yaml"))
      print(DebeziumConfigGen.generate(cfg))

    case Some("watch") if args.contains("--ingest-gate") =>
      val spark = GraftSession.local()
      spark.sparkContext.setLogLevel("WARN")
      val q = IngestCli.start(spark, args)
      if (args.contains("--once")) {
        q.processAllAvailable(); q.stop()
        println(IngestCli.summary(spark, args))
      } else q.awaitTermination()
      spark.stop()

    case Some("watch") =>
      val cfg = CdcConfig.load(opt(args, "--config").getOrElse("./config.yaml"))
      val in = req(args, "--in")
      val ckpt = req(args, "--checkpoint")
      val spark = GraftSession.local()
      spark.sparkContext.setLogLevel("WARN")
      val records = opt(args, "--source").getOrElse("graft-cdc") match {
        case "graft-cdc" =>
          // DSv2 segment-log source: epoch-commit ack + delete-mode
          // retention (the XACK/XDEL analogue; sources/CdcDirectorySource)
          spark.readStream.format("graft-cdc")
            .option("path", in)
            .option("acknowledge", cfg.source.acknowledge)
            .option("maxSegmentsPerTrigger",
              math.max(1, cfg.buffers.source.size / 1000))
            .load()
        case "json" =>
          val schema = StructType(Seq(
            StructField("id", LongType), StructField("table", StringType),
            StructField("envelope", StringType)))
          spark.readStream.schema(schema)
            // count arm of the reference's count-or-time source buffer
            .option("maxFilesPerTrigger", math.max(1, cfg.buffers.source.size / 1000))
            .json(in)
        case "redis" =>
          // the reference's actual I/O plane: one stream per watched table
          // named <source.prefix><table> (WatchStream.java:323), consumer
          // group + XACK/XDEL handled by the DSv2 source. --in is the
          // redis:// (or mem://) URL here; --url overrides for tests.
          val url = opt(args, "--url").getOrElse(
            s"redis://${cfg.source.connection.host}:${cfg.source.connection.port}")
          val streams = cfg.mapping.keys.toSeq.sorted
            .map(t => s"${cfg.source.prefix}$t").mkString(",")
          spark.readStream.format("graft-redis")
            .option("url", url)
            .option("streams", streams)
            .option("group", cfg.source.group)
            .option("prefix", cfg.source.prefix)
            .option("acknowledge", cfg.source.acknowledge)
            .option("maxRecordsPerTrigger", cfg.buffers.source.size)
            .load()
        case other =>
          System.err.println(s"unknown --source $other (graft-cdc|json|redis)"); sys.exit(2)
      }
      val q = opt(args, "--sink").getOrElse("parquet") match {
        case "parquet" =>
          CdcStream.start(records, Routing.routesDf(spark, cfg),
            cfg.buffers.target.size, req(args, "--out"), ckpt,
            windowMillis = cfg.buffers.dedupe.time)
        case "redis" =>
          // the reference's actual output plane: XADD id-array entries to
          // <target.prefix><target> with startup priming (WatchStream
          // .java:261-295). --target-url overrides the config for tests.
          val turl = opt(args, "--target-url").getOrElse(
            s"redis://${cfg.target.connection.host}:${cfg.target.connection.port}")
          RedisStreamsSink.prime(turl, cfg.target.prefix,
            cfg.routes.map(_.target).distinct)
          CdcStream.startWith(records, Routing.routesDf(spark, cfg),
            cfg.buffers.target.size, ckpt,
            windowMillis = cfg.buffers.dedupe.time)(
            RedisStreamsSink.writer(turl, cfg.target.prefix))
        case other =>
          System.err.println(s"unknown --sink $other (parquet|redis)"); sys.exit(2)
      }
      if (args.contains("--once")) { q.processAllAvailable(); q.stop() }
      else q.awaitTermination()
      spark.stop()

    case _ =>
      System.err.println("usage: graft.Main watch|generate [--config <file>] ...")
      sys.exit(2)
  }

  private def opt(args: Array[String], name: String): Option[String] = {
    val i = args.indexOf(name)
    if (i >= 0 && i + 1 < args.length) Some(args(i + 1)) else None
  }
  private def req(args: Array[String], name: String): String =
    opt(args, name).getOrElse {
      System.err.println(s"missing required $name"); sys.exit(2)
    }
}
