package org.apache.spark.sql.graftext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.UserDefinedFunctionUtils
import org.apache.spark.sql.expressions.{SparkUserDefinedFunction, UserDefinedFunction}

/** Arity-overloaded SQL function registration.
  *
  * Spark's `spark.udf.register` REPLACES a same-name function instead
  * of overloading it, but the reference's host SQL (DuckDB) declares
  * `ml_create` with both 2- and 3-arg signatures
  * (reference src/lib.rs:23-86). This registers ONE name whose builder
  * dispatches on call arity — each arity backed by an ordinary
  * [[UserDefinedFunction]], so determinism flags and encoders are
  * preserved. Lives under `org.apache.spark.sql` because
  * `sessionState`/`ExpressionUtils` are `private[sql]`.
  */
object FunctionRegistration {

  def registerOverloaded(
      spark: SparkSession,
      name: String,
      byArity: Map[Int, UserDefinedFunction],
  ): Unit = {
    val arities = byArity.keys.toSeq.sorted.mkString("/")
    val builder: Seq[Expression] => Expression = { children =>
      byArity.get(children.length) match {
        case Some(f: SparkUserDefinedFunction) =>
          // direct ScalaUDF construction (the same path UDFRegistration
          // takes) — a lazy ColumnNodeExpression wrapper would reach
          // codegen unconverted when returned from a raw builder
          UserDefinedFunctionUtils.toScalaUDF(f, children)
        case Some(other) =>
          throw new IllegalArgumentException(s"$name: unsupported UDF kind ${other.getClass}")
        case None =>
          throw new IllegalArgumentException(
            s"$name takes $arities arguments, got ${children.length}")
      }
    }
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
  }
}
