package graft.textutil

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst-facing faces over [[TextHash]], callable from generated
  * Java (Scala-object static forwarders): UTF8String in,
  * UnsafeArrayData / InternalRow out — no Scala↔Catalyst converters,
  * no boxing. These are what the graftext signature expressions
  * compile down to.
  */
object TextHashKernels {

  /** Sorted distinct mixed shingle-hash set as Catalyst array data. */
  def shingleSet(text: UTF8String, n: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(TextHash.sortedShingleSet(text.toString, n))

  /** POSITIONAL shingle hashes: element i = streamed FNV-1a of the
    * k-token window starting at token i (order kept, duplicates
    * kept) — the span-dedup primitive.
    */
  def shingleHashes(text: UTF8String, n: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(TextHash.hashedShingles(text.toString, n))

  /** struct(sig: array<long>, grams: array<long>) — the one-scan
    * MinHash prep (densified-OPH signature + the exact shingle set the
    * verify path intersects).
    */
  def minhashPrep(text: UTF8String, n: Int, numHashes: Int): InternalRow = {
    val grams = TextHash.sortedShingleSet(text.toString, n)
    new GenericInternalRow(
      Array[Any](
        UnsafeArrayData.fromPrimitiveArray(TextHash.ophSignature(grams, numHashes)),
        UnsafeArrayData.fromPrimitiveArray(grams),
      ),
    )
  }

  def simhash64(text: UTF8String): Long = TextHash.simhash64(text.toString)

  /** Distinct word n-gram strings (first-occurrence order) as
    * Catalyst array data — the cross-document commonality primitive.
    */
  def distinctNgrams(text: UTF8String, n: Int): ArrayData = {
    val grams = TextHash.distinctWordNgrams(text.toString, n)
    val out = new Array[Any](grams.length)
    var i = 0
    while (i < grams.length) { out(i) = UTF8String.fromString(grams(i)); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** struct(n_tokens, n_distinct_tokens, top_token_frac,
    * dup_bigram_frac, dup_trigram_frac) — the Gopher-style
    * within-document repetition signals, one tokenize pass, exact
    * string identity (no hashing, so the DuckDB oracle is bit-exact).
    * Ratios are single int/int IEEE divisions; empty denominators → 0.
    */
  def repetitionStats(text: UTF8String): InternalRow = {
    val toks = TextHash.tokenize(text.toString)
    val n = toks.length
    val uni = new java.util.HashMap[String, Integer]()
    var maxC = 0
    var i = 0
    while (i < n) {
      val c = uni.merge(toks(i), Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
      if (c > maxC) maxC = c
      i += 1
    }
    // duplicate fraction of word k-gram OCCURRENCES (1 - distinct/total)
    def dupFrac(k: Int): Double = {
      val m = n - k + 1
      if (m <= 0) return 0.0
      val seen = new java.util.HashSet[String]()
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < m) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      (m - seen.size).toDouble / m.toDouble
    }
    new GenericInternalRow(
      Array[Any](
        n.toLong,
        uni.size.toLong,
        if (n == 0) 0.0 else maxC.toDouble / n.toDouble,
        dupFrac(2),
        dupFrac(3),
      ),
    )
  }

  def winnowSignature(text: UTF8String, k: Int, w: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(TextHash.winnowSignature(text.toString, k, w))

  def hashedNgramFeatures(text: UTF8String, dim: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(TextHash.hashedNgramFeatures(text.toString, dim))
}
