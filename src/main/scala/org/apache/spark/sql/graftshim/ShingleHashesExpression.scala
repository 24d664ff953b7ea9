package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.FastHash

/**
 * Native Catalyst expression for the per-document shingle-hash-set
 * prep — the hottest single kernel of the dedup family (every
 * Jaccard/MinHash/contamination path starts with it). `doGenCode`
 * keeps it inside whole-stage codegen: no UDF closure invocation, no
 * Row conversion boundary, result materialized directly as an
 * `UnsafeArrayData` over primitive longs. Delegates to the static JVM
 * kernel [[graft.functions.FastHash.shingleHashSet]] (the same pattern
 * Spark built-ins use for non-trivial kernels).
 *
 * Lives under org.apache.spark.sql.* because `ExpectsInputTypes` /
 * `ExpressionUtils` are private[sql] — same shim rationale as
 * [[TrigramSimilarityExpr]].
 */
case class ShingleHashesExpr(child: Expression, shingleLen: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  protected override def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      FastHash.shingleHashSet(input.asInstanceOf[UTF8String].toString, shingleLen))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.sql.catalyst.expressions.UnsafeArrayData" +
        s".fromPrimitiveArray(graft.functions.FastHash.shingleHashSet($c.toString(), $shingleLen))")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

object ShingleColumns {
  def shingleHashes(text: Column, k: Int): Column =
    ExpressionUtils.column(ShingleHashesExpr(ExpressionUtils.expression(text), k))
}
