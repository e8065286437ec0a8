package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Morton (Z-order) curve position of d integral columns: the low `bits`
  * bits of each child (clamped, not wrapped — see [[Kernels.zpart]]) are
  * interleaved into one long, so sorting by the result co-locates rows
  * that are close in EVERY dimension at once. This is the layout key for
  * multi-dimensional data skipping: a file sorted by `zvalue(a, b)` has
  * narrow per-file min/max ranges on BOTH a and b, so parquet row-group
  * stats prune predicates on either column — a linear sort gives that for
  * its leading column only. Requires d·bits ≤ 63.
  *
  * Codegen emits one [[Kernels.zpart]] call per child OR-ed together, so
  * the key computation stays inside the scan's WholeStageCodegen span.
  */
case class ZValue(children: Seq[Expression], bits: Int) extends Expression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.isEmpty)
      TypeCheckResult.TypeCheckFailure("zvalue needs at least one column")
    else if (bits < 1 || children.size * bits > 63)
      TypeCheckResult.TypeCheckFailure(
        s"zvalue: ${children.size} cols × $bits bits must fit in 63")
    else if (children.forall(_.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zvalue needs integral columns, got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  override def eval(input: InternalRow): Any = {
    val d = children.size
    var out = 0L
    var i = 0
    while (i < d) {
      val v = children(i).eval(input)
      if (v == null) return null
      out |= Kernels.zpart(v.asInstanceOf[Number].longValue(), i, d, bits)
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val d = children.size
    val gens = children.map(_.genCode(ctx))
    val anyNull = gens.map(_.isNull.toString).mkString(" || ")
    val parts = gens.zipWithIndex.map { case (g, i) =>
      s"graft.functions.Kernels.zpart((long)(${g.value}), $i, $d, $bits)"
    }.mkString(" | ")
    ev.copy(code = code"""
      ${gens.map(_.code).mkString("\n")}
      boolean ${ev.isNull} = $anyNull;
      long ${ev.value} = ${ev.isNull} ? 0L : ($parts);
    """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
