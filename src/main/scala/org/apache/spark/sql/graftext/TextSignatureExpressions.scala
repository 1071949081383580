/*
 * Hosted under org.apache.spark.sql because Catalyst's expression
 * plumbing (AbstractDataType, ExpressionUtils.column) is private[sql].
 * Public API surface: graft.functions.TextSignatures.
 */
package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native signature expressions for the dedup/fingerprint hot paths.
  *
  * The per-document signature pass (tokenize → shingle-hash → OPH /
  * simhash / winnow) is the dominant cost of every near-dup operator
  * at corpus scale. As Scala UDFs these paid catalyst→Scala→catalyst
  * conversion per row — for array outputs that's a boxed `Seq[Long]`
  * materialization both ways. Each expression here stays inside
  * whole-stage codegen and hands back `UnsafeArrayData` wrapping the
  * kernel's primitive array ([[graft.textutil.TextHashKernels]]);
  * eval semantics are bit-identical to the UDFs they replace
  * (locked by TextSignatureExpressionsSpec).
  */
case class TextShingleSet(child: Expression, n: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_set"

  override def nullSafeEval(t: Any): Any =
    graft.textutil.TextHashKernels.shingleSet(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.textutil.TextHashKernels.shingleSet($t, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Positional shingle hashes (order kept, duplicates kept) — element
  * i hashes the k-token window starting at token i.
  */
case class TextShingleHashes(child: Expression, n: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(t: Any): Any =
    graft.textutil.TextHashKernels.shingleHashes(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.textutil.TextHashKernels.shingleHashes($t, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct word n-grams of a document as `array<string>` — one
  * tokenize pass per row in a primitive kernel. The equivalent
  * built-in HOF (`array_distinct(transform(sequence…, i →
  * concat_ws(slice(w…))))`) re-evaluates the token array once per
  * gram AND runs interpreted; this stays in whole-stage codegen.
  */
case class TextDistinctNgrams(child: Expression, n: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "distinct_ngrams"

  override def nullSafeEval(t: Any): Any =
    graft.textutil.TextHashKernels.distinctNgrams(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.textutil.TextHashKernels.distinctNgrams($t, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextSignatureExpressions {
  /** Column-DSL faces (shape params are plan-time constants). */
  def shingleSet(text: Column, n: Int): Column =
    ExpressionUtils.column(TextShingleSet(ExpressionUtils.expression(text), n))
  def distinctNgrams(text: Column, n: Int): Column =
    ExpressionUtils.column(TextDistinctNgrams(ExpressionUtils.expression(text), n))
  def shingleHashes(text: Column, n: Int): Column =
    ExpressionUtils.column(TextShingleHashes(ExpressionUtils.expression(text), n))
  def minhashPrep(text: Column, n: Int, numHashes: Int): Column =
    ExpressionUtils.column(MinHashPrep(ExpressionUtils.expression(text), n, numHashes))
  def simhash64(text: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(text)))
  def winnowSignature(text: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(WinnowSignature(ExpressionUtils.expression(text), k, w))
  def repetitionStats(text: Column): Column =
    ExpressionUtils.column(TextRepetitionStats(ExpressionUtils.expression(text)))
  def hashedNgramFeatures(text: Column, dim: Int): Column =
    ExpressionUtils.column(HashedNgramFeatures(ExpressionUtils.expression(text), dim))
}

/** One-scan MinHash prep: struct(sig: array<long>, grams: array<long>). */
case class MinHashPrep(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(
    Seq(
      StructField("sig", ArrayType(LongType, containsNull = false), nullable = false),
      StructField("grams", ArrayType(LongType, containsNull = false), nullable = false),
    ),
  )
  override def prettyName: String = "minhash_prep"

  override def nullSafeEval(t: Any): Any =
    graft.textutil.TextHashKernels.minhashPrep(t.asInstanceOf[UTF8String], n, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.textutil.TextHashKernels.minhashPrep($t, $n, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Gopher-style within-document repetition signals:
  * struct(n_tokens, n_distinct_tokens, top_token_frac,
  * dup_bigram_frac, dup_trigram_frac). Exact string identity — the
  * SQL-oracle formulation (list_distinct over the token list) is
  * bit-exact, not hash-approximate.
  */
case class TextRepetitionStats(child: Expression)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  // "word"-scoped names: [^\p{L}\p{N}_]+ tokens, deliberately DISTINCT from the
  // whitespace-token `n_tokens` that qualityStats emits — composing
  // the two operators must not silently redefine a column
  override def dataType: DataType = StructType(
    Seq(
      StructField("n_word_tokens", LongType, nullable = false),
      StructField("n_distinct_words", LongType, nullable = false),
      StructField("top_token_frac", DoubleType, nullable = false),
      StructField("dup_bigram_frac", DoubleType, nullable = false),
      StructField("dup_trigram_frac", DoubleType, nullable = false),
    ),
  )
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(t: Any): Any =
    graft.textutil.TextHashKernels.repetitionStats(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.textutil.TextHashKernels.repetitionStats($t);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hashed bag-of-{1,2}-gram features (hashing trick, L2-normalized)
  * — the fastText-style featurization for distilled quality
  * classifiers. array<float> of plan-time-constant width `dim`.
  */
case class HashedNgramFeatures(child: Expression, dim: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "hashed_ngram_features"

  override def nullSafeEval(t: Any): Any =
    graft.textutil.TextHashKernels.hashedNgramFeatures(t.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.textutil.TextHashKernels.hashedNgramFeatures($t, $dim);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Frequency-weighted 64-bit SimHash over word unigrams. */
case class SimHash64(child: Expression)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(t: Any): Any =
    graft.textutil.TextHashKernels.simhash64(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.textutil.TextHashKernels.simhash64($t);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing (MOSS) fingerprint signature: sorted distinct window
  * minima of rolling char-k-gram hashes.
  */
case class WinnowSignature(child: Expression, k: Int, w: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_signature"

  override def nullSafeEval(t: Any): Any =
    graft.textutil.TextHashKernels.winnowSignature(t.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.textutil.TextHashKernels.winnowSignature($t, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
