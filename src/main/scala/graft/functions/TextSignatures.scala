package graft.functions

import org.apache.spark.sql.Column

/** Public faces of the native text-signature expressions
  * (implementation in [[org.apache.spark.sql.graftext]]; kernels in
  * [[graft.textutil.TextHash]]). Semantics are bit-identical to the
  * Scala-UDF formulations they replace — sorted distinct
  * `mix64(fnv64(word-shingle))` sets, densified-OPH MinHash,
  * frequency-weighted SimHash, winnowing fingerprints — without UDF
  * serde on the per-document signature pass.
  */
object TextSignatures {
  def shingleSet(text: Column, n: Int): Column =
    org.apache.spark.sql.graftext.TextSignatureExpressions.shingleSet(text, n)
  def shingleHashes(text: Column, n: Int): Column =
    org.apache.spark.sql.graftext.TextSignatureExpressions.shingleHashes(text, n)
  def distinctNgrams(text: Column, n: Int): Column =
    org.apache.spark.sql.graftext.TextSignatureExpressions.distinctNgrams(text, n)
  def minhashPrep(text: Column, n: Int, numHashes: Int): Column =
    org.apache.spark.sql.graftext.TextSignatureExpressions.minhashPrep(text, n, numHashes)
  def simhash64(text: Column): Column =
    org.apache.spark.sql.graftext.TextSignatureExpressions.simhash64(text)
  def winnowSignature(text: Column, k: Int, w: Int): Column =
    org.apache.spark.sql.graftext.TextSignatureExpressions.winnowSignature(text, k, w)
  def repetitionStats(text: Column): Column =
    org.apache.spark.sql.graftext.TextSignatureExpressions.repetitionStats(text)
  def hashedNgramFeatures(text: Column, dim: Int): Column =
    org.apache.spark.sql.graftext.TextSignatureExpressions.hashedNgramFeatures(text, dim)

  /** Unicode normalization ("NFC" | "NFD" | "NFKC" | "NFKD") — see
    * [[org.apache.spark.sql.graftext.UnicodeNormalize]]. NFC before
    * hashing makes composed/decomposed encodings of the same text
    * dedup together (CCNet/C4 both normalize first).
    */
  def unicodeNormalize(text: Column, form: String = "NFC"): Column =
    org.apache.spark.sql.graftext.TextNormalizeExpressions.unicodeNormalize(text, form)
}
