/*
 * Hosted under org.apache.spark.sql because Catalyst's expression
 * plumbing is private[sql]. Public API surface:
 * graft.operators.Layout.
 */
package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** 2-D Z-order (Morton) curve value: interleaves the LOW 32 BITS of
  * each input (a's bits at even positions, b's at odd), producing a
  * 64-bit key whose range-partitions are rectangles-ish in (a, b)
  * space — the standard multi-column clustering key for min/max data
  * skipping. Inputs outside [0, 2³²) wrap (masked); callers
  * normalize/bucket first if their domain is wider.
  *
  * The magic-constant spreading is the textbook O(log w) bit trick —
  * same value as the naive per-bit loop, which the DuckDB oracle
  * recomputes with shift/and/or arithmetic.
  */
case class ZOrderValue(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "z_value"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderValue.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graftext.ZOrderValue.interleave($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression,
  ): Expression = copy(left = newLeft, right = newRight)
}

object ZOrderValue {
  /** Spread the low 32 bits of x to the even bit positions of a long. */
  def spread(x0: Long): Long = {
    var x = x0 & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  def zValue(a: Column, b: Column): Column =
    ExpressionUtils.column(
      ZOrderValue(ExpressionUtils.expression(a), ExpressionUtils.expression(b)),
    )
}
