package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, FloatType}

import graft.ml.Mlp

/** MLP inference as a native Catalyst expression (SURVEY §7.3's
  * "ml_pred as a codegen Expression" candidate): the weight snapshot
  * rides in the expression tree (models are KB-sized — serialized once
  * per plan via the codegen reference array, not per row like a UDF
  * closure), input ArrayData is read as a primitive float array with
  * no Seq boxing, and the call participates in whole-stage codegen.
  *
  * Same eval-mode semantics as [[graft.ml.Mlp.predict]] (dropout off,
  * BatchNorm running stats — reference src/nn/mod.rs:71).
  */
case class MlpPredict(child: Expression, model: Mlp)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = s"ml_pred_${model.name}"

  override def nullSafeEval(input: Any): Any =
    MlpPredict.run(model, input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("mlpModel", model, classOf[Mlp].getName)
    defineCodeGen(ctx, ev, x =>
      s"org.apache.spark.sql.graftext.MlpPredict.run($modelRef, $x)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MlpPredict {
  /** Shared eval/codegen entry: primitive in, primitive out. */
  def run(model: Mlp, input: ArrayData): ArrayData = {
    val out = model.predict(input.toFloatArray())
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  def column(features: Column, model: Mlp): Column =
    ExpressionUtils.column(MlpPredict(ExpressionUtils.expression(features), model))
}
