package graft.textutil

import java.text.Normalizer

import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization kernel behind
  * [[org.apache.spark.sql.graftext.UnicodeNormalize]].
  *
  * Why this exists: a web-scale corpus mixes composed and decomposed
  * encodings of the same text ("café" as U+00E9 vs e + U+0301), and
  * every downstream hash — exact dedup, shingles, MinHash, line dedup
  * — treats them as different documents. Canonicalizing to NFC before
  * hashing is the standard fix (CCNet and C4 both normalize before
  * dedup). DuckDB's `nfc_normalize` implements the same Unicode
  * canonical composition, so the NFC face is oracle-checkable
  * byte-for-byte (q108).
  *
  * ASCII fast path: ASCII is invariant under all four forms, and
  * `UTF8String` exposes the raw bytes, so an all-ASCII document (the
  * overwhelming majority of bytes even in multilingual corpora)
  * returns the SAME object — no String round-trip, no allocation.
  * Non-ASCII falls back to `java.text.Normalizer` (ICU-equivalent for
  * the canonical forms; part of the JDK, no added dependency).
  */
object TextNorm {

  private def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  /** form is one of "NFC" | "NFD" | "NFKC" | "NFKD" (validated at
    * plan time by the expression).
    */
  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String =
    if (isAscii(s)) s
    else UTF8String.fromString(Normalizer.normalize(s.toString, form))
}
