package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression for Unicode NFC normalization — Spark has
 * no builtin for it (DuckDB ships `nfc_normalize`; a cleaning pipeline
 * needs it before content-hash dedup). Same pattern as
 * [[TrigramSimilarityExpr]]: `doGenCode` keeps the call inside
 * whole-stage codegen, delegating to the static kernel
 * [[graft.functions.TextNorm.nfc]] whose `isNormalized` fast path
 * makes ASCII-dominant corpora near-free.
 */
case class NfcNormalizeExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  protected override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      graft.functions.TextNorm.nfc(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.TextNorm.nfc($c.toString()))")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalizeExpr = copy(child = newChild)
}

/** Column-API bridge (ExpressionUtils is private[sql]). */
object UnicodeColumns {
  def nfcNormalize(c: Column): Column =
    ExpressionUtils.column(NfcNormalizeExpr(ExpressionUtils.expression(c)))
}
