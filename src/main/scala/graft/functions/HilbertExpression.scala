package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Hilbert curve position of d integral columns ([[Kernels.hilbertPos]] —
  * Skilling's public 2004 algorithm): like [[ZValue]] a space-filling-curve
  * layout key for multi-dimensional data skipping, but with the stronger
  * locality guarantee — consecutive curve positions are always adjacent
  * cells (Morton's long diagonal jumps at power-of-two boundaries are what
  * widen a file's min/max box), so the same range-partition + sort layout
  * pass yields tighter per-file stats and prunes more files per predicate.
  * Requires d·bits ≤ 63.
  *
  * Codegen emits one static kernel call; the only per-row allocation is the
  * d-element coordinate array, which C2 scalar-replaces (no escape).
  */
case class HValue(children: Seq[Expression], bits: Int) extends Expression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.isEmpty)
      TypeCheckResult.TypeCheckFailure("hvalue needs at least one column")
    else if (bits < 1 || children.size * bits > 63)
      TypeCheckResult.TypeCheckFailure(
        s"hvalue: ${children.size} cols × $bits bits must fit in 63")
    else if (children.forall(_.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hvalue needs integral columns, got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  override def eval(input: InternalRow): Any = {
    val d = children.size
    val coords = new Array[Long](d)
    var i = 0
    while (i < d) {
      val v = children(i).eval(input)
      if (v == null) return null
      coords(i) = v.asInstanceOf[Number].longValue()
      i += 1
    }
    Kernels.hilbertPos(coords, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gens = children.map(_.genCode(ctx))
    val anyNull = gens.map(_.isNull.toString).mkString(" || ")
    val coords = gens.map(g => s"(long)(${g.value})").mkString(", ")
    ev.copy(code = code"""
      ${gens.map(_.code).mkString("\n")}
      boolean ${ev.isNull} = $anyNull;
      long ${ev.value} = ${ev.isNull} ? 0L
        : graft.functions.Kernels.hilbertPos(new long[]{$coords}, $bits);
    """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
