package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{aggregate, lit, sqrt, zip_with}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for vector similarity and content hashing.
  *
  * Each `doGenCode` emits ONE static [[Kernels]] call, so plans using these
  * keep a single WholeStageCodegen span (verified via .explain("formatted")).
  * A Scala UDF here would cost serialization + iterator breaks; the built-in
  * higher-order-function route (`aggregate(zip_with(...))`) costs ~10× in
  * per-element Invoke overhead — see [[VectorFunctions.cosineBuiltin]] kept
  * for cross-checking in tests.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType
  private def isFloat: Boolean = elemType(left) == FloatType

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok && elemType(left) == elemType(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity needs two arrays of the same float/double type, " +
        s"got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (isFloat) Kernels.cosineF(x, y) else Kernels.cosineD(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloat) "cosineF" else "cosineD"
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.$fn($a, $b)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** 64-bit SimHash of an array<string> token column. With `md5 = true` the
  * per-token hash is [[Kernels.md5hash60]] (60 effective bits) so a SQL
  * oracle can replicate the fingerprint; `seed` is then ignored.
  */
case class SimHash64(child: Expression, seed: Long = 42L, md5: Boolean = false)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    if (md5) Kernels.simhash64Md5(v.asInstanceOf[ArrayData])
    else Kernels.simhash64(v.asInstanceOf[ArrayData], seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (md5) defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.simhash64Md5($c)")
    else defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.simhash64($c, ${seed}L)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** MinHash signature (array<bigint> of length k) of an array<string> column. */
case class MinHashSignature(child: Expression, k: Int, seed: Long = 42L)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Kernels.minhash(v.asInstanceOf[ArrayData], k, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.minhash($c, $k, ${seed}L)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** MinHash signature with inline word n-gram shingling (see
  * [[Kernels.minhashShingled]]): array<string> tokens → array<bigint>[k].
  */
case class MinHashShingled(child: Expression, n: Int, k: Int, seed: Long = 42L)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Kernels.minhashShingled(v.asInstanceOf[ArrayData], n, k, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.minhashShingled($c, $n, $k, ${seed}L)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Winnowing fingerprint set (array<bigint>) of an array<string> tokens.
  * With `md5 = true` gram hashes come from [[Kernels.md5hash60]] (SQL-oracle
  * replicable); `seed` is then ignored.
  */
case class WinnowFingerprint(child: Expression, n: Int, w: Int,
                             seed: Long = 42L, md5: Boolean = false)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    if (md5) Kernels.winnowMd5(v.asInstanceOf[ArrayData], n, w)
    else Kernels.winnow(v.asInstanceOf[ArrayData], n, w, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (md5) defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.winnowMd5($c, $n, $w)")
    else defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.winnow($c, $n, $w, ${seed}L)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Exact set-Jaccard of two array<string> columns, single evaluation. */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.jaccardSim(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.jaccardSim($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Distinct word n-gram shingle set of an array<string> token column. */
case class ShingleSet(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Kernels.shingleSet(v.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.shingleSet($c, $n)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Dot product of two array<float> columns (double accumulation). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.dotF($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Euclidean norm of an array<float> column. */
case class VecNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    Kernels.normF(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.normF($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Random-hyperplane LSH sign sketch (long bitset) of an array<float>. */
case class HyperplaneSketch(child: Expression, planes: Int, seed: Long = 42L)
    extends UnaryExpression {
  require(planes > 0 && planes <= 64, "planes must be in [1,64]")
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    Kernels.hyperplaneSketch(v.asInstanceOf[ArrayData], planes, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.hyperplaneSketch($c, $planes, ${seed}L)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Hyperplane sketch with md5-derived weights (SQL-oracle replicable — see
  * [[Kernels.hyperplaneSketchMd5]]); `tag` namespaces the plane family so
  * multi-table LSH gets independent sketches per table.
  */
case class HyperplaneSketchMd5(child: Expression, planes: Int, tag: String)
    extends UnaryExpression {
  require(planes > 0 && planes <= 64, "planes must be in [1,64]")
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    Kernels.hyperplaneSketchMd5(v.asInstanceOf[ArrayData], planes, tag)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tagRef = ctx.addReferenceObj("hpTag", tag, "java.lang.String")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.hyperplaneSketchMd5($c, $planes, $tagRef)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** IVF cell assignment: index of the nearest centroid (see
  * [[Kernels.nearestCentroid]]). The centroid matrix rides as a codegen
  * reference object — no per-row boxing, no broadcast-variable plumbing
  * (nlist × dim doubles is KBs, serialized once per task with the plan).
  */
case class NearestCentroid(child: Expression, cents: Array[Double],
                           norms: Array[Double], dim: Int)
    extends UnaryExpression {
  require(dim > 0 && norms.length * dim == cents.length,
    "cents must be a row-major (ncells x dim) matrix with one norm per row")
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    Kernels.nearestCentroid(v.asInstanceOf[ArrayData], cents, norms, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCents", cents, "double[]")
    val nRef = ctx.addReferenceObj("ivfNorms", norms, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.nearestCentroid($c, $cRef, $nRef, $dim)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** IVF multi-probe: the nprobe nearest centroid ids (array<int>), same
  * score/tie order as [[NearestCentroid]].
  */
case class ProbeCentroids(child: Expression, cents: Array[Double],
                          norms: Array[Double], dim: Int, nprobe: Int)
    extends UnaryExpression {
  require(dim > 0 && norms.length * dim == cents.length,
    "cents must be a row-major (ncells x dim) matrix with one norm per row")
  require(nprobe > 0, "nprobe must be positive")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Kernels.probeCentroids(v.asInstanceOf[ArrayData], cents, norms, dim, nprobe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCents", cents, "double[]")
    val nRef = ctx.addReferenceObj("ivfNorms", norms, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.probeCentroids($c, $cRef, $nRef, $dim, $nprobe)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Product-quantization encode: array<int> of `m` codeword indices (see
  * [[Kernels.pqEncode]]). The flat codebook rides as a codegen reference
  * object — `m*ncode*dsub` doubles is KBs, serialized once with the plan.
  */
case class PqEncode(child: Expression, cb: Array[Double], m: Int, dsub: Int,
                    ncode: Int)
    extends UnaryExpression {
  require(m > 0 && dsub > 0 && ncode > 0 && cb.length == m * ncode * dsub,
    "cb must be a flat (m x ncode x dsub) codebook")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Kernels.pqEncode(v.asInstanceOf[ArrayData], cb, m, dsub, ncode)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCb", cb, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.pqEncode($c, $cbRef, $m, $dsub, $ncode)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** ADC score of a query vector against a PQ code array (see
  * [[Kernels.pqAdcScore]]): the corpus side contributes `m` ints, not
  * `m*dsub` floats.
  */
case class PqAdcScore(left: Expression, right: Expression, cb: Array[Double],
                      m: Int, dsub: Int, ncode: Int)
    extends BinaryExpression {
  require(m > 0 && dsub > 0 && ncode > 0 && cb.length == m * ncode * dsub,
    "cb must be a flat (m x ncode x dsub) codebook")
  override def dataType: DataType = DoubleType
  override def nullSafeEval(codes: Any, q: Any): Any =
    Kernels.pqAdcScore(codes.asInstanceOf[ArrayData], q.asInstanceOf[ArrayData],
      cb, m, dsub, ncode)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCb", cb, "double[]")
    defineCodeGen(ctx, ev, (c, q) =>
      s"graft.functions.Kernels.pqAdcScore($c, $q, $cbRef, $m, $dsub, $ncode)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Column-level entry points. */
object VectorFunctions {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  def cosine(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))

  def dot(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  def norm(a: Column): Column = column(VecNorm(expression(a)))

  def simhash(tokens: Column, seed: Long = 42L): Column =
    column(SimHash64(expression(tokens), seed))

  /** SimHash with the md5-derived 60-bit token hash (oracle-replicable). */
  def simhashMd5(tokens: Column): Column =
    column(SimHash64(expression(tokens), 0L, md5 = true))

  def minhashSig(tokens: Column, k: Int, seed: Long = 42L): Column =
    column(MinHashSignature(expression(tokens), k, seed))

  def hyperplaneSketch(vec: Column, planes: Int, seed: Long = 42L): Column =
    column(HyperplaneSketch(expression(vec), planes, seed))

  /** Hyperplane sketch with the md5-derived weights (oracle-replicable). */
  def hyperplaneSketchMd5(vec: Column, planes: Int, tag: String): Column =
    column(HyperplaneSketchMd5(expression(vec), planes, tag))

  def nearestCentroid(vec: Column, cents: Array[Double], norms: Array[Double],
                      dim: Int): Column =
    column(NearestCentroid(expression(vec), cents, norms, dim))

  def probeCentroids(vec: Column, cents: Array[Double], norms: Array[Double],
                     dim: Int, nprobe: Int): Column =
    column(ProbeCentroids(expression(vec), cents, norms, dim, nprobe))

  def pqEncode(vec: Column, cb: Array[Double], m: Int, dsub: Int,
               ncode: Int): Column =
    column(PqEncode(expression(vec), cb, m, dsub, ncode))

  def pqAdcScore(codes: Column, q: Column, cb: Array[Double], m: Int,
                 dsub: Int, ncode: Int): Column =
    column(PqAdcScore(expression(codes), expression(q), cb, m, dsub, ncode))

  def minhashShingled(tokens: Column, n: Int, k: Int, seed: Long = 42L): Column =
    column(MinHashShingled(expression(tokens), n, k, seed))

  def shingleSet(tokens: Column, n: Int): Column =
    column(ShingleSet(expression(tokens), n))

  def jaccard(a: Column, b: Column): Column =
    column(JaccardSim(expression(a), expression(b)))

  def winnow(tokens: Column, n: Int, w: Int, seed: Long = 42L): Column =
    column(WinnowFingerprint(expression(tokens), n, w, seed))

  /** Winnowing with the md5-derived 60-bit gram hash (oracle-replicable). */
  def winnowMd5(tokens: Column, n: Int, w: Int): Column =
    column(WinnowFingerprint(expression(tokens), n, w, 0L, md5 = true))

  /** Built-in-only cosine (higher-order functions) — slower; retained as the
    * independent implementation for property tests against [[cosine]].
    */
  def cosineBuiltin(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }
}
