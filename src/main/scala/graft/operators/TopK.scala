package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed Aggregator — the scale-correct alternative to
  * `row_number().over(partitionBy(group))` for per-group top-k.
  *
  * The window approach shuffles EVERY row to its group's partition and sorts
  * there: at 100 TB that is a full-data exchange dominated by rows that are
  * about to be discarded. This aggregator keeps a size-k sorted buffer per
  * group; Spark's partial aggregation runs it map-side, so only
  * k rows × groups × partitions cross the wire — for top-10 over a billion
  * rows per group, a ~10^8× shuffle reduction.
  *
  * Determinism: ordering is (score DESC, id ASC) with id as total tiebreak.
  */
object TopK {

  case class Entry(score: Double, id: Long)
  case class Buf(items: Seq[Entry])

  private def insert(items: Seq[Entry], e: Entry, k: Int): Seq[Entry] = {
    // items kept sorted (score desc, id asc), length <= k
    if (items.size >= k) {
      val last = items.last
      if (e.score < last.score || (e.score == last.score && e.id >= last.id))
        return items
    }
    val (before, after) = items.span(x =>
      x.score > e.score || (x.score == e.score && x.id < e.id))
    (before ++ (e +: after)).take(k)
  }

  /** Aggregates (key, entry) tuples, ignoring the key (supplied by
    * groupByKey) — avoids needing a contramap on TypedColumn.
    */
  class TopKAgg[K](k: Int) extends Aggregator[(K, Entry), Buf, Buf] {
    override def zero: Buf = Buf(Vector.empty)
    override def reduce(b: Buf, e: (K, Entry)): Buf = Buf(insert(b.items, e._2, k))
    override def merge(a: Buf, b: Buf): Buf =
      Buf(b.items.foldLeft(a.items)((acc, e) => insert(acc, e, k)))
    override def finish(b: Buf): Buf = b
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }

  /** Top-k entries per group of a keyed dataset. */
  def perGroup[K: Encoder](ds: Dataset[(K, Entry)], k: Int): Dataset[(K, Buf)] = {
    implicit val tupleEnc: Encoder[(K, Buf)] =
      Encoders.tuple(implicitly[Encoder[K]], Encoders.product[Buf])
    ds.groupByKey(_._1).agg(new TopKAgg[K](k).toColumn)
  }
}
