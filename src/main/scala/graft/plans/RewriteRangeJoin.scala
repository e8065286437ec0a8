package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite a point-in-interval join with NO equi-key —
  * which Spark can only plan as BroadcastNestedLoopJoin / cartesian,
  * O(|P|·|I|) at 100 TB — into the bucketized equi-join that
  * [[graft.operators.RangeJoin]] exposes as an operator:
  *
  *   P JOIN I ON p >= lo AND p <= hi
  *   ⇒ (P + bucket(p)) JOIN (I × explode(bucketRange(lo,hi))) ON bucket
  *        [residual: the original range predicate]
  *
  * Opt-in per session via `spark.graft.rangeJoin.bucketWidth` (domain units;
  * pick ≈ median interval width — same contract as Databricks' RANGE_JOIN
  * hint's bin size). The rule fires only on Inner joins whose condition has a
  * point-interval conjunct pair over integral/numeric columns and NO
  * equi-conjunct (with one, the join is already shuffle-plannable and
  * bucketing would only add explode cost).
  *
  * Correctness: floor(x/w) is monotonic (IEEE division by a positive
  * constant preserves order), so x∈[lo,hi] ⇒ bucket(x)∈[bucket(lo),
  * bucket(hi)] — candidate generation is a superset, and the original
  * predicate is kept as the join's residual filter. Runs post-analysis, so
  * the rewrite emits a fully-resolved plan (fresh exprIds for the bucket
  * attributes, explicit casts).
  */
case class RewriteRangeJoin() extends Rule[LogicalPlan] {

  private val confKey = "spark.graft.rangeJoin.bucketWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(confKey, "")
    if (width.isEmpty) return plan
    val w = width.toLong
    require(w > 0, s"$confKey must be positive")
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if candidatePair(cond, left, right).isDefined =>
        val (point, lo, hi) = candidatePair(cond, left, right).get
        rewrite(j, left, right, cond, point, lo, hi, w, hint)
    }
  }

  /** Find (point, lo, hi): a conjunct pair `point >= lo` / `point <= hi`
    * with point from one side and both bounds from the other, and no
    * equi-conjunct anywhere in the condition. Returns bounds oriented so
    * `point` is from the LEFT child.
    */
  private def candidatePair(cond: Expression, left: LogicalPlan,
                            right: LogicalPlan): Option[(Expression, Expression, Expression)] = {
    val conjuncts = splitConjuncts(cond)
    def fromLeft(e: Expression) = e.references.subsetOf(left.outputSet) && e.references.nonEmpty
    def fromRight(e: Expression) = e.references.subsetOf(right.outputSet) && e.references.nonEmpty
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => (fromLeft(a) && fromRight(b)) || (fromRight(a) && fromLeft(b))
      case _ => false
    }
    if (hasEqui) return None
    // collect lower bounds (point >= bound) and upper bounds (point <= bound)
    // keyed by the point expression's canonical form, point on the left side
    def numeric(e: Expression) = e.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
    val lows = scala.collection.mutable.Map[Expression, Expression]()
    val highs = scala.collection.mutable.Map[Expression, Expression]()
    conjuncts.foreach {
      case GreaterThanOrEqual(p, b) if fromLeft(p) && fromRight(b) && numeric(p) =>
        lows.getOrElseUpdate(p.canonicalized, b); ()
      case LessThanOrEqual(b, p) if fromLeft(p) && fromRight(b) && numeric(p) =>
        lows.getOrElseUpdate(p.canonicalized, b); ()
      case LessThanOrEqual(p, b) if fromLeft(p) && fromRight(b) && numeric(p) =>
        highs.getOrElseUpdate(p.canonicalized, b); ()
      case GreaterThanOrEqual(b, p) if fromLeft(p) && fromRight(b) && numeric(p) =>
        highs.getOrElseUpdate(p.canonicalized, b); ()
      case _ => ()
    }
    lows.keys.find(highs.contains).map { pc =>
      val point = conjuncts.collectFirst {
        case GreaterThanOrEqual(p, _) if p.canonicalized == pc => p
        case LessThanOrEqual(p, _) if p.canonicalized == pc => p
        case LessThanOrEqual(_, p) if p.canonicalized == pc => p
        case GreaterThanOrEqual(_, p) if p.canonicalized == pc => p
      }.get
      (point, lows(pc), highs(pc))
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** floor(x / w) as a LongType expression (monotonic bucketing). */
  private def bucketOf(x: Expression, w: Long): Expression =
    Cast(Floor(Divide(Cast(x, DoubleType), Literal(w.toDouble))), LongType)

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression, point: Expression, lo: Expression,
                      hi: Expression, w: Long, hint: JoinHint): LogicalPlan = {
    val leftBucket = AttributeReference("_rj_bucket_l", LongType, nullable = true)()
    val leftProj = Project(left.output :+ Alias(bucketOf(point, w), leftBucket.name)(
      leftBucket.exprId), left)
    val rightBucket = AttributeReference("_rj_bucket_r", LongType, nullable = false)()
    // Sequence is TimeZoneAware: without an explicit zone it stays unresolved
    // (this rule runs post-analysis, nothing re-resolves it)
    val bLo = bucketOf(lo, w)
    val bHi = bucketOf(hi, w)
    // A dirty interval row (hi < lo, or a NULL bound) would make Sequence
    // throw "Illegal sequence boundaries" and kill the job — the unrewritten
    // query simply matches nothing for that row. Emit an empty bucket list
    // instead; Explode of an empty array drops the row, preserving the
    // original semantics.
    val seq = If(
      And(And(IsNotNull(bLo), IsNotNull(bHi)), LessThanOrEqual(bLo, bHi)),
      Sequence(bLo, bHi, Some(Literal(1L)), Some(conf.sessionLocalTimeZone)),
      Literal.create(Array.empty[Long],
        org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)))
    val gen = Generate(Explode(seq), unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(rightBucket), child = right)
    val newCond = And(EqualTo(leftBucket, rightBucket), cond)
    Project(j.output, Join(leftProj, gen, Inner, Some(newCond), hint))
  }
}

/** Engine extensions entry point: `spark.sql.extensions=graft.plans.GraftExtensions`
  * (or `.withExtensions(new GraftExtensions)`). Rules are no-ops until their
  * session confs are set; injected functions expose the engine's native
  * expressions to SQL (`SELECT graft_cosine(a, b)` etc.).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
  import graft.functions._

  private def fn(name: String, usage: String)(
      builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo("graft", name, usage), builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteRangeJoin())
    ext.injectFunction(fn("graft_cosine",
      "graft_cosine(a, b) - cosine similarity of two float/double arrays") {
      args => CosineSimilarity(args(0), args(1))
    })
    ext.injectFunction(fn("graft_normalize_text",
      "graft_normalize_text(s) - NFC + casefold + whitespace collapse") {
      args => NormalizeText(args(0))
    })
    ext.injectFunction(fn("graft_simhash",
      "graft_simhash(tokens) - 64-bit SimHash of an array<string>") {
      args => SimHash64(args(0))
    })
    ext.injectFunction(fn("graft_jaccard",
      "graft_jaccard(a, b) - exact set-Jaccard of two array<string>") {
      args => JaccardSim(args(0), args(1))
    })
    ext.injectFunction(fn("graft_dot",
      "graft_dot(a, b) - dot product of two float arrays (double accumulation)") {
      args => DotProduct(args(0), args(1))
    })
    ext.injectFunction(fn("graft_norm",
      "graft_norm(a) - Euclidean norm of a float array") {
      args => VecNorm(args(0))
    })
  }
}
