/*
 * Hosted under org.apache.spark.sql because Catalyst's expression
 * plumbing (AbstractDataType, ExpressionUtils.column) is private[sql].
 * Public API surface: graft.functions.TextSignatures.unicodeNormalize.
 */
package org.apache.spark.sql.graftext

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical/compatibility normalization as a codegen'd
  * expression (kernel: [[graft.textutil.TextNorm]]). Spark has no
  * built-in for this; a Scala UDF would pay catalyst↔String serde per
  * row — this stays inside whole-stage codegen and short-circuits
  * ASCII input without allocating. The form is a plan-time constant,
  * resolved once to the `Normalizer.Form` enum (an invalid name fails
  * at planning, not per-row).
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression
    with ExpectsInputTypes {

  private val resolvedForm: Normalizer.Form = Normalizer.Form.valueOf(form.toUpperCase)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(t: Any): Any =
    graft.textutil.TextNorm.normalize(t.asInstanceOf[UTF8String], resolvedForm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formName = resolvedForm.name()
    nullSafeCodeGen(ctx, ev, t =>
      s"""${ev.value} = graft.textutil.TextNorm.normalize(
         |  $t, java.text.Normalizer.Form.$formName);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextNormalizeExpressions {
  def unicodeNormalize(text: Column, form: String): Column =
    ExpressionUtils.column(UnicodeNormalize(ExpressionUtils.expression(text), form))
}
