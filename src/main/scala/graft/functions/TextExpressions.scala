package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.GraftBridge.{column, expression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text normalization (NFC + casefold + whitespace collapse) as a
  * native expression: one static Kernels call from generated code, so the
  * normalize → tokenize → score pipeline stays a single codegen span over
  * the scan. Spark ships no unicode-normalize builtin; the UDF route would
  * break codegen at the hottest point of a 100 TB text pipeline.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"normalize_text needs STRING, got ${child.dataType}")
  }
  override def nullSafeEval(v: Any): Any =
    Kernels.normalizeText(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.normalizeText($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object TextExpressions {
  def normalizeText(text: Column): Column = column(NormalizeText(expression(text)))
}
