package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join: salt the skewed (big) side into `salts`
  * sub-keys and replicate the other side once per salt, so one hot key's
  * rows spread over `salts` shuffle partitions instead of pinning one
  * reducer at 100 TB.
  *
  * AQE's skew-join split (on by default in [[graft.GraftSession]]) handles
  * the sort-merge case at runtime; this explicit form remains necessary when
  * (a) the skewed side feeds a shuffle-HASH join AQE won't split, (b) the
  * skew is in a streaming stateful join where AQE never runs, or (c) the
  * hot-key set is known and the replication factor should be bounded
  * explicitly rather than discovered per-batch.
  *
  * The salt is `xxhash64(whole row) mod salts` — deterministic (re-runs and
  * retried tasks salt identically, required for exactly-once sinks), and
  * uniform even when the join key is constant.
  */
object SaltedJoin {

  def inner(big: DataFrame, small: DataFrame, keys: Seq[String],
            salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(salts.toLong)))
    val replSmall = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig.join(replSmall, keys :+ "_salt").drop("_salt")
  }
}
