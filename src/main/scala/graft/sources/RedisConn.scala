package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

/** A Redis stream entry id, `ms-seq` (two unsigned-ish longs). String order
  * is NOT entry order ("10-0" < "9-0" lexicographically) — all offset math
  * goes through this numeric ordering, mirroring Redis's RecordId total
  * order per stream (the reference keys its in-flight ack countdowns on it,
  * WatchStream.java:233-242).
  */
final case class RedisId(ms: Long, seq: Long) extends Ordered[RedisId] {
  override def compare(that: RedisId): Int = {
    val c = java.lang.Long.compareUnsigned(ms, that.ms)
    if (c != 0) c else java.lang.Long.compareUnsigned(seq, that.seq)
  }
  override def toString: String = s"${java.lang.Long.toUnsignedString(ms)}-" +
    java.lang.Long.toUnsignedString(seq)
}

object RedisId {
  val Zero: RedisId = RedisId(0L, 0L)
  def parse(s: String): RedisId = s.split("-") match {
    case Array(ms, seq) => RedisId(java.lang.Long.parseUnsignedLong(ms),
      java.lang.Long.parseUnsignedLong(seq))
    case Array(ms) => RedisId(java.lang.Long.parseUnsignedLong(ms), 0L)
    case _ => throw new IllegalArgumentException(s"bad redis id: $s")
  }
}

/** The handful of Redis Streams commands the connector needs — the exact
  * command surface of the reference (`XREADGROUP`-equivalent range reads,
  * group attach, `XACK`, conditional `XDEL`: RedisSource.java:72-93,
  * WatchStream.java:193-220). Kept minimal so the in-memory fake is a
  * complete, honest implementation rather than a mock.
  *
  * Connections are cheap single-use handles: the driver opens one for
  * offset planning/commit, every partition reader opens its own (an
  * executor cannot share the driver's socket).
  */
trait RedisConn extends AutoCloseable {
  /** Idempotent `XGROUP CREATE <stream> <group> <from> MKSTREAM` —
    * BUSYGROUP (already exists) is swallowed like the reference's attach
    * (RedisSource.java:73-78).
    */
  def xgroupCreate(stream: String, group: String, from: RedisId): Unit

  /** Entries with `afterExclusive < id <= endInclusive`, at most `count`,
    * in id order: `XRANGE <stream> (<after> <end> COUNT <count>`.
    * Deterministic range replay is what lets a Spark micro-batch re-read
    * the same (start, end] after a failure — the consumer-group PEL's job
    * in the reference is done by the offset WAL here.
    */
  def xrange(stream: String, afterExclusive: RedisId, endInclusive: RedisId,
             count: Int): Seq[(RedisId, Map[String, String])]

  /** Highest id present, `XREVRANGE <stream> + - COUNT 1`; None if empty. */
  def xlatestId(stream: String): Option[RedisId]

  /** `XACK <stream> <group> <ids...>` — idempotent; returns #newly acked. */
  def xack(stream: String, group: String, ids: Seq[RedisId]): Long

  /** `XDEL <stream> <ids...>` — the delete-mode retention trim (A6). */
  def xdel(stream: String, ids: Seq[RedisId]): Long

  /** `XADD <stream> <id|*> <k v ...>` — used by tests and upstream writers. */
  def xadd(stream: String, body: Seq[(String, String)],
           id: Option[RedisId] = None): RedisId

  /** Entry count, `XLEN` — spec assertions for retention trimming. */
  def xlen(stream: String): Long
}

object RedisConn {
  /** `mem://<name>` → shared JVM-local fake (CI; one instance per name);
    * `redis://host[:port]` → RESP2 socket client (production/integration).
    */
  def open(url: String): RedisConn = url match {
    case s if s.startsWith("mem://") => InMemoryRedis.named(s.stripPrefix("mem://"))
    case s if s.startsWith("redis://") =>
      val hp = s.stripPrefix("redis://")
      val (host, port) = hp.split(":") match {
        case Array(h, p) => (h, p.toInt)
        case Array(h) => (h, 6379)
        case _ => throw new IllegalArgumentException(s"bad redis url: $url")
      }
      new RespRedis(host, port)
    case _ => throw new IllegalArgumentException(
      s"unsupported redis url (want mem:// or redis://): $url")
  }
}

/** Complete in-memory Redis Streams fake — real data structures (sorted
  * entry log per stream, per-group ack sets), not canned responses, so the
  * connector's offset/commit/retention logic is exercised for real in CI
  * where no Redis server exists. JVM-global by name: local-mode executors
  * and the driver resolve `mem://x` to the same instance.
  */
final class InMemoryRedis private () extends RedisConn {
  import scala.jdk.CollectionConverters._
  private val streams =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.ConcurrentSkipListMap[RedisId, Map[String, String]]]()
  private val groups =
    new java.util.concurrent.ConcurrentHashMap[(String, String),
      java.util.concurrent.ConcurrentSkipListSet[RedisId]]()
  private val lastId = new java.util.concurrent.ConcurrentHashMap[String, RedisId]()

  private def log(stream: String) = streams.computeIfAbsent(stream,
    _ => new java.util.concurrent.ConcurrentSkipListMap[RedisId, Map[String, String]](
      Ordering[RedisId]))

  override def xgroupCreate(stream: String, group: String, from: RedisId): Unit = {
    log(stream)
    groups.computeIfAbsent((stream, group),
      _ => new java.util.concurrent.ConcurrentSkipListSet[RedisId](Ordering[RedisId]))
    ()
  }

  override def xrange(stream: String, afterExclusive: RedisId,
                      endInclusive: RedisId, count: Int): Seq[(RedisId, Map[String, String])] =
    log(stream).subMap(afterExclusive, false, endInclusive, true)
      .entrySet().iterator().asScala.take(count)
      .map(e => (e.getKey, e.getValue)).toSeq

  override def xlatestId(stream: String): Option[RedisId] =
    Option(log(stream).lastEntry()).map(_.getKey)

  override def xack(stream: String, group: String, ids: Seq[RedisId]): Long = {
    val g = groups.get((stream, group))
    require(g != null, s"NOGROUP $stream $group")
    ids.count(id => log(stream).containsKey(id) && g.add(id)).toLong
  }

  override def xdel(stream: String, ids: Seq[RedisId]): Long =
    ids.count(id => log(stream).remove(id) != null).toLong

  override def xadd(stream: String, body: Seq[(String, String)],
                    id: Option[RedisId]): RedisId = this.synchronized {
    val prev = lastId.getOrDefault(stream, RedisId.Zero)
    val next = id match {
      case Some(explicit) =>
        require(explicit > prev, s"XADD id $explicit <= last $prev")
        explicit
      case None => RedisId(prev.ms + 1, 0L) // deterministic logical clock
    }
    log(stream).put(next, body.toMap)
    lastId.put(stream, next)
    next
  }

  override def xlen(stream: String): Long = log(stream).size().toLong

  /** Ack-set view for spec assertions (the fake's PEL-completion analogue). */
  def ackedIds(stream: String, group: String): Set[RedisId] = {
    val g = groups.get((stream, group))
    if (g == null) Set.empty else g.iterator().asScala.toSet
  }

  override def close(): Unit = () // shared instance; nothing to release
}

object InMemoryRedis {
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, InMemoryRedis]()
  def named(name: String): InMemoryRedis =
    registry.computeIfAbsent(name, _ => new InMemoryRedis())
  /** Drop an instance (test isolation between specs). */
  def reset(name: String): Unit = { registry.remove(name); () }
}

/** Minimal blocking RESP2 client over a plain socket — only the six
  * commands in [[RedisConn]], no pooling, no pipelining (the connector's
  * per-trigger command volume is tiny; data-plane reads are batched by
  * COUNT). Protocol per the public Redis serialization spec.
  */
final class RespRedis(host: String, port: Int) extends RedisConn {
  private val socket = new Socket(host, port)
  socket.setTcpNoDelay(true)
  private val in = new BufferedInputStream(socket.getInputStream)
  private val out = new BufferedOutputStream(socket.getOutputStream)

  private def send(args: Seq[String]): Any = this.synchronized {
    out.write(s"*${args.size}\r\n".getBytes(UTF_8))
    args.foreach { a =>
      val b = a.getBytes(UTF_8)
      out.write(s"$$${b.length}\r\n".getBytes(UTF_8))
      out.write(b); out.write('\r'); out.write('\n')
    }
    out.flush()
    readReply(in)
  }

  private def readLine(s: InputStream): String = {
    val sb = new java.lang.StringBuilder
    var c = s.read()
    while (c != '\r') {
      if (c < 0) throw new java.io.EOFException("redis connection closed")
      sb.append(c.toChar); c = s.read()
    }
    s.read() // \n
    sb.toString
  }

  private def readReply(s: InputStream): Any = s.read() match {
    case '+' => readLine(s)
    case '-' => throw new RespRedis.RedisError(readLine(s))
    case ':' => readLine(s).toLong
    case '$' =>
      val n = readLine(s).toInt
      if (n < 0) null
      else {
        val buf = new Array[Byte](n)
        var off = 0
        while (off < n) {
          val r = s.read(buf, off, n - off)
          if (r < 0) throw new java.io.EOFException("redis connection closed")
          off += r
        }
        s.read(); s.read() // \r\n
        new String(buf, UTF_8)
      }
    case '*' =>
      val n = readLine(s).toInt
      if (n < 0) null else Seq.fill(n)(readReply(s))
    case c => throw new IllegalStateException(s"bad RESP type byte: $c")
  }

  override def xgroupCreate(stream: String, group: String, from: RedisId): Unit =
    try { send(Seq("XGROUP", "CREATE", stream, group, from.toString, "MKSTREAM")); () }
    catch { case e: RespRedis.RedisError if e.getMessage.startsWith("BUSYGROUP") => () }

  override def xrange(stream: String, afterExclusive: RedisId,
                      endInclusive: RedisId, count: Int): Seq[(RedisId, Map[String, String])] =
    send(Seq("XRANGE", stream, s"($afterExclusive", endInclusive.toString,
        "COUNT", count.toString)) match {
      case entries: Seq[_] => entries.map {
        case Seq(id: String, fields: Seq[_]) =>
          val kv = fields.asInstanceOf[Seq[String]].grouped(2)
            .collect { case Seq(k, v) => k -> v }.toMap
          (RedisId.parse(id), kv)
        case other => throw new IllegalStateException(s"bad XRANGE entry: $other")
      }
      case null => Seq.empty
      case other => throw new IllegalStateException(s"bad XRANGE reply: $other")
    }

  override def xlatestId(stream: String): Option[RedisId] =
    send(Seq("XREVRANGE", stream, "+", "-", "COUNT", "1")) match {
      case Seq(Seq(id: String, _)) => Some(RedisId.parse(id))
      case _ => None
    }

  override def xack(stream: String, group: String, ids: Seq[RedisId]): Long =
    if (ids.isEmpty) 0L
    else send(Seq("XACK", stream, group) ++ ids.map(_.toString)).asInstanceOf[Long]

  override def xdel(stream: String, ids: Seq[RedisId]): Long =
    if (ids.isEmpty) 0L
    else send(Seq("XDEL", stream) ++ ids.map(_.toString)).asInstanceOf[Long]

  override def xadd(stream: String, body: Seq[(String, String)],
                    id: Option[RedisId]): RedisId = {
    val args = Seq("XADD", stream, id.map(_.toString).getOrElse("*")) ++
      body.flatMap { case (k, v) => Seq(k, v) }
    RedisId.parse(send(args).asInstanceOf[String])
  }

  override def xlen(stream: String): Long =
    send(Seq("XLEN", stream)).asInstanceOf[Long]

  override def close(): Unit = socket.close()
}

object RespRedis {
  final class RedisError(msg: String) extends RuntimeException(msg)
}
