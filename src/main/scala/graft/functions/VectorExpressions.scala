package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}

/** Public faces of the native vector expressions (implementation lives
  * in [[org.apache.spark.sql.graftext]] because Catalyst's expression
  * plumbing is private[sql]). See that file for semantics; contract:
  * DOUBLE, index-ascending accumulation — bit-equal to the DuckDB
  * oracle and to the interpreted `zip_with`/`aggregate` formulation.
  */
object VectorExpressions {
  def vecDot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftext.VectorExpressions.vecDot(a, b)
  def vecNorm(a: Column): Column =
    org.apache.spark.sql.graftext.VectorExpressions.vecNorm(a)
  def vecCosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graftext.VectorExpressions.vecCosine(a, b)
  def sortedIntersectCount(a: Column, b: Column): Column =
    org.apache.spark.sql.graftext.VectorExpressions.sortedIntersectCount(a, b)
  def pqAdcScore(code: Column, lut: Column, ksub: Int): Column =
    org.apache.spark.sql.graftext.VectorExpressions.pqAdcScore(code, lut, ksub)
  def signPack(v: Column): Column =
    org.apache.spark.sql.graftext.VectorExpressions.signPack(v)
  def hammingDist(a: Column, b: Column): Column =
    org.apache.spark.sql.graftext.VectorExpressions.hammingDist(a, b)
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.graftext.VectorExpressions.register(spark)
}

/** `spark.sql.extensions`-compatible alias in the public namespace. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private val inner = new org.apache.spark.sql.graftext.GraftExtensions
  override def apply(ext: SparkSessionExtensions): Unit = inner(ext)
}
