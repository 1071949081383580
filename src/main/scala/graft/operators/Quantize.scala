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

  /** Sign-bit binary quantization: 32× smaller than float32. Word `w`
    * packs components `[32w, 32w+32)` little-endian-by-bit
    * (`bit i = [x_{32w+i} > 0]`), emitted as `array<bigint>` of
    * `ceil(dim/32)` words. 32-bit words in a 64-bit lane keep every
    * value non-negative, so the packing is plain integer arithmetic
    * with no sign-bit wraparound to reason about across engines —
    * DuckDB replays it bit-for-bit with `list_transform` +
    * `generate_series` (oracle q106).
    *
    * Backed by the native `sign_pack` expression
    * ([[graft.functions.VectorExpressions.signPack]]): a primitive
    * loop inside whole-stage codegen. The portable higher-order-
    * function formulation ([[signPackPortable]]) is the cross-engine
    * reference the oracle mirrors — QuantizeSpec locks the two equal;
    * the HOF form allocates per element per row, which on a corpus
    * scan is measurable and on an all-pairs scan is the dominant
    * cost.
    */
  def signPack(vecCol: Column): Column =
    graft.functions.VectorExpressions.signPack(vecCol)

  /** Hamming distance between two packed sign codes:
    * `Σ bit_count(a_w XOR b_w)` — native no-allocation codegen loop
    * ([[graft.functions.VectorExpressions.hammingDist]]); DuckDB
    * replays it as `list_sum(list_transform(..., bit_count(xor(..))))`.
    * Codes must share a length (same dim).
    */
  def hammingDist(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.hammingDist(a, b)

  /** The engine-portable pure-`functions` formulation of
    * [[signPack]] (`2^i` as `pow(2,i)::long` — exact for i ≤ 31 —
    * because `shiftleft` needs a literal shift in the Scala DSL).
    * Kept as the executable specification the DuckDB oracle mirrors;
    * QuantizeSpec asserts bit-equality with the native expression.
    * NULL/empty vectors give an empty code (`when`'s otherwise
    * branch), where the native face is null-preserving.
    */
  private[graft] def signPackPortable(vecCol: Column): Column = {
    val len = size(vecCol)
    val nWords = ((len + lit(31)) / lit(32)).cast("int")
    when(len > 0,
      transform(
        sequence(lit(0), nWords - 1),
        w =>
          aggregate(
            sequence(lit(0), lit(31)),
            lit(0L),
            (acc, i) =>
              acc + when(
                w * 32 + i < len && element_at(vecCol, w * 32 + i + 1) > lit(0.0f),
                pow(lit(2.0), i).cast("long")).otherwise(lit(0L)),
          ),
      )).otherwise(array().cast("array<bigint>"))
  }

  /** Portable formulation of [[hammingDist]] (see
    * [[signPackPortable]] for why both exist). */
  private[graft] def hammingDistPortable(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L),
      (acc, v) => acc + v)
}
