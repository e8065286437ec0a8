package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming log compaction — the continuous form of [[graft.cdc.Scd2.compact]]:
  * maintain the newest version per key across micro-batches and emit a
  * changelog row whenever a key's latest version advances.
  *
  * Semantics:
  *   - "newest" = highest `off` (source offset) ever seen for the key, so
  *     replayed or out-of-order older versions are ignored — idempotent under
  *     the at-least-once delivery the CDC source provides;
  *   - output is an UPDATE changelog (one row per key per batch in which the
  *     key advanced) — exactly what a downstream idempotent upsert sink
  *     consumes.
  *
  * Scale: keyed state holds ONE row per key (the compaction invariant),
  * store-backed (RocksDB/HDFS) and hash-partitioned by key — state size is
  * the dimension's cardinality, not the stream's. No timeout: a latest-state
  * table is permanent by definition; bound it upstream (key TTL policy) if
  * the key space is unbounded.
  */
object StateCompaction {

  /** One version of one key, as delivered by the change stream. */
  case class Version(key: Long, off: Long, payload: String)

  /** Changelog row: `key`'s newest version advanced to (`off`, `payload`). */
  case class Latest(key: Long, off: Long, payload: String)

  def apply(versions: Dataset[Version]): Dataset[Latest] = {
    implicit val latestEnc = Encoders.product[Latest]
    implicit val longEnc = Encoders.scalaLong
    versions.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[Version], state: GroupState[Latest]) =>
          val newest = rows.maxBy(v => (v.off, v.payload))
          val advanced = state.getOption.forall(_.off < newest.off)
          if (advanced) {
            val latest = Latest(key, newest.off, newest.payload)
            state.update(latest)
            Iterator.single(latest)
          } else Iterator.empty
      }
  }
}
