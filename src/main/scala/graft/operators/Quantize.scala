package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Embedding quantization: 4× smaller vectors (float32 → int8) for
  * storage- and bandwidth-bound ANN at scale, keeping ~0.4% worst-case
  * per-component error. Everything here is pure codegen expression
  * arithmetic — no UDF — and every op (`abs`/`max`/`floor`/division)
  * is IEEE-exact and engine-portable, so the DuckDB oracle checks the
  * quantized bytes bit-for-bit.
  */
object Quantize {

  /** Per-vector symmetric int8: `scale = 127 / max|x|`,
    * `q_i = clamp(floor(x_i·scale + 0.5), ±127)` (round-half-up via
    * floor — `round()`'s half-even/half-away behavior differs across
    * engines, floor+0.5 does not). All-zero vectors get scale 0 and
    * all-zero codes. Adds (max_abs, scale, vec_q).
    */
  def int8Symmetric(df: DataFrame, vecCol: String): DataFrame = {
    val maxAbs = array_max(transform(col(vecCol), x => abs(x.cast("double"))))
    df.withColumn("max_abs", maxAbs)
      .withColumn("scale", when(col("max_abs") > 0, lit(127.0) / col("max_abs")).otherwise(lit(0.0)))
      .withColumn(
        "vec_q",
        transform(
          col(vecCol),
          x =>
            greatest(lit(-127L), least(lit(127L), floor(x.cast("double") * col("scale") + lit(0.5))))
              .cast("tinyint"),
        ),
      )
  }

  /** Dequantized value column for error analysis: `q / scale`
    * (array<double>; all-zero scale dequantizes to zeros).
    */
  def dequantize(vecQ: Column, scale: Column): Column =
    transform(vecQ, q => when(scale > 0, q.cast("double") / scale).otherwise(lit(0.0)))
}
