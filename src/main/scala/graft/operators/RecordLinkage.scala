package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy record linkage: all pairs within Levenshtein distance 1, found via
  * deletion-neighborhood blocking (the SymSpell/FastSS family) instead of a
  * quadratic cross join.
  *
  * Identity: two strings are within edit distance 1 (insert, delete, or
  * substitute) only if their deletion-1 neighborhoods — the string itself
  * plus every single-character deletion — intersect. So an equi-join on
  * neighborhood keys generates a complete candidate set, and an exact
  * `levenshtein` check on the (distinct) candidates removes the false
  * positives (strings whose neighborhoods collide at distance 2, e.g. "ab"
  * vs "ba" via key "a"/"b" — both deletions of each).
  *
  * Scale shape (100 TB): each side explodes into O(len+1) key rows; the
  * candidate generator is a plain equi-join on the key, so it shuffles keys
  * + ids only and partitions by key hash. The verify stage runs on DISTINCT
  * candidate pairs, which is output-bounded: every candidate shares a
  * concrete key with its partner, so the pair volume is at most the true
  * near-duplicate volume plus the distance-2 collision fringe. Hot keys come
  * from clusters of identical/near-identical strings — there the *answer*
  * is quadratic in the cluster, so no blocking scheme can beat the output
  * size; if such clusters are expected, exact-dedupe each side first (one
  * hash agg) and link the distinct strings.
  */
object RecordLinkage {

  /** Deletion-1 neighborhood: the string plus each single-char deletion,
    * deduplicated (deleting either char of a double letter yields the same
    * string — without the dedup those rows would double in the join).
    */
  private def delKeys(s: org.apache.spark.sql.Column) =
    array_distinct(concat(
      array(s),
      transform(sequence(lit(1), length(s)),
        i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s))))))

  /** Target build-side rows per shuffle-hash partition for the candidate
    * join: ~500k exploded key rows ≈ 50 MB of UnsafeHashedRelation — 32 of
    * them concurrently (local[32]) stay under 2 GB of execution memory.
    * A shuffle-hash BUILD cannot spill: it either fits its partition in
    * memory or the task dies. At the session's default partition count the
    * build side is |records|·(len+1)/partitions rows, which grows
    * unboundedly with the data — measured at the 100x rehearsal tier:
    * ~85M exploded rows over 32 partitions = 2.7M-row builds,
    * SparkOutOfMemoryError "not enough memory to build hash map" at a 24 GB
    * heap. The pinned-strategy join therefore sizes its own exchange.
    */
  private val TargetBuildRows = 500000L

  /** Candidate-join partition count: one cheap bounded agg (Σ len+1 = the
    * exploded row count) sizes the exchange so each shuffle-hash build
    * holds ≤ [[TargetBuildRows]] rows. Never below the session's shuffle
    * partitions — at bench scale the plan is bit-identical to the unsized
    * one; the extra count job only exists because the planner's stats
    * cannot see through the explode (same blind spot that motivates the
    * strategy pin itself).
    */
  private def candidateParts(df: DataFrame, strCol: String): Int = {
    val expRows = df.agg(sum(length(col(strCol)).cast("long") + 1L))
      .head().getAs[Any](0) match {
        case null => 0L
        case n: java.lang.Long => n.longValue()
        case n => n.toString.toLong
      }
    val sessionParts =
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    math.max(sessionParts.toLong, expRows / TargetBuildRows + 1)
      .min(1L << 20).toInt
  }

  /** All (left id, right id) pairs whose strings are within Levenshtein
    * distance 1.
    *
    * @param left  (idCol, strCol) — ids must be unique per side
    * @param right (idCol, strCol)
    * @return (left_id, right_id, left_str, right_str, dist) with dist ∈ {0,1}
    */
  def fuzzyJoin(left: DataFrame, right: DataFrame,
                idCol: String, strCol: String): DataFrame = {
    // The candidate generator and its distinct carry ID PAIRS ONLY — the
    // strings would otherwise ride the widest shuffle of the operator
    // ~len(s)+1 times each (once per deletion key). They re-attach by id
    // for the verify stage, which runs on the distinct candidates — an
    // output-bounded set, so the re-attach joins are the cheap side.
    def keyed(df: DataFrame, side: String) = df.select(
      col(idCol).cast("long").as(s"${side}_id"),
      explode(delKeys(col(strCol))).as("k"))
    def strs(df: DataFrame, side: String) = df.select(
      col(idCol).cast("long").as(s"${side}_id"),
      col(strCol).as(s"${side}_str"))

    // the candidate join sits directly over scan+explode, so the planner's
    // size estimate is the pre-explode child's (explode does not inflate
    // stats) — at a large input that under-estimate selects a broadcast
    // build of the O(len+1)-inflated key table, which grows unboundedly
    // with the data and dies at Spark's 8 GiB broadcast cap (measured at
    // the 100x rehearsal tier: a 15.6 GiB attempted build). The operator
    // KNOWS the inflation, so it pins the strategy: shuffle-hash, keyed by
    // k — no sort, per-partition builds, both sides partitioned by the key
    // at a width sized from the exploded row count (candidateParts) so each
    // unspillable build fits however large the input grows
    val parts = candidateParts(left, strCol)
    keyed(left, "left").repartition(parts, col("k"))
      .hint("shuffle_hash")
      .join(keyed(right, "right").repartition(parts, col("k")), "k")
      .select("left_id", "right_id")
      .distinct()
      .join(strs(left, "left"), "left_id")
      .join(strs(right, "right"), "right_id")
      .select("left_id", "right_id", "left_str", "right_str")
      // threshold form: the DP runs banded (O(threshold·len) cells, early
      // exit) and returns -1 above the bound — for kept rows the value is
      // the true distance, so the output contract is unchanged
      .withColumn("dist",
        levenshtein(col("left_str"), col("right_str"), 1).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= 1)
  }

  /** [[fuzzyJoin]] of a table against ITSELF, with the `id_a < id_b`
    * canonicalization pushed INSIDE the candidate join. Calling
    * `fuzzyJoin(df, df)` and filtering afterwards is semantically identical
    * but pays for what the filter throws away: every record self-matches on
    * all O(len+1) of its deletion keys — n·(len+1) join hits that ride the
    * DISTINCT shuffle, the two string re-attach joins, and the levenshtein
    * verify before dying at the caller's filter (at the 100× rehearsal tier
    * that is ~90M doomed rows of the entity-resolution plane's widest
    * shuffle) — and each true pair is enumerated from BOTH sides of the
    * diagonal. The in-join predicate removes the self-hits and halves the
    * off-diagonal candidates before anything is shuffled onward.
    *
    * Output: (left_id, right_id, left_str, right_str, dist) with
    * left_id < right_id — exactly `fuzzyJoin(df, df).filter(left < right)`.
    */
  def fuzzySelfJoin(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    // exchange width sized from the exploded row count — see candidateParts
    val parts = candidateParts(df, strCol)
    val keyed = df.select(col(idCol).cast("long").as("id"),
      explode(delKeys(col(strCol))).as("k"))
      .repartition(parts, col("k"))
    val strs = df.select(col(idCol).cast("long").as("_sid"),
      col(strCol).as("_s"))
    // same explode-blind-estimate reasoning as fuzzyJoin: pin shuffle_hash
    keyed.as("a").hint("shuffle_hash").join(keyed.as("b"),
        col("a.k") === col("b.k") && col("a.id") < col("b.id"))
      .select(col("a.id").as("left_id"), col("b.id").as("right_id"))
      .distinct()
      .join(strs.select(col("_sid").as("left_id"), col("_s").as("left_str")),
        "left_id")
      .join(strs.select(col("_sid").as("right_id"), col("_s").as("right_str")),
        "right_id")
      .select("left_id", "right_id", "left_str", "right_str")
      .withColumn("dist",
        levenshtein(col("left_str"), col("right_str"), 1).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= 1)
  }
}
