package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document-level quality filter bundles — the published heuristic
  * rule sets a curation pipeline applies before any model-based
  * scoring. Pure per-row maps (one tokenize pass per document, no
  * shuffle, stream as-is at any scale).
  *
  * The rule set follows Gopher's quality heuristics (Rae et al.,
  * "Scaling Language Models: ...", 2021, Table A1), with one
  * documented simplification: the symbol-to-word-ratio rule counts
  * the fraction of WORDS containing a symbol (#, ellipsis) rather
  * than raw symbol occurrences — same intent, one fewer pass.
  * Every threshold is a parameter; defaults are the published ones.
  */
object QualityFilters {

  final case class GopherFlags(
      n_words: Long,
      ok_word_count: Boolean,
      ok_mean_word_len: Boolean,
      ok_symbol_ratio: Boolean,
      ok_bullet_lines: Boolean,
      ok_ellipsis_lines: Boolean,
      ok_alpha_words: Boolean,
      ok_stopwords: Boolean,
      pass: Boolean,
  )

  private val stopwords = Array("the", "be", "to", "of", "and", "that", "have", "with")

  /** One-pass kernel; whitespace words, newline lines — the exact
    * arithmetic the DuckDB oracle reproduces (single integer-exact
    * divisions, inclusive bounds). Cross-engine parity details:
    * the word splitter is the explicit class `[ \t\n\r\f]+` (RE2's
    * `\s` — Java's `\s` additionally matches `\x0B` and would split
    * differently on vertical tabs), and word length counts Unicode
    * CODEPOINTS (DuckDB `length()`), not UTF-16 units, so non-BMP
    * characters weigh 1 on both sides.
    */
  private[graft] def gopherFlagsKernel(
      text: String,
      minWords: Long,
      maxWords: Long,
      minMeanLen: Double,
      maxMeanLen: Double,
      maxSymbolFrac: Double,
      maxBulletFrac: Double,
      maxEllipsisFrac: Double,
      minAlphaFrac: Double,
      minStopwords: Int,
  ): GopherFlags = {
    val t = if (text == null) "" else text
    val words = t.split("[ \t\n\r\f]+").filter(_.nonEmpty)
    val n = words.length.toLong
    if (n == 0)
      return GopherFlags(0L, ok_word_count = false, ok_mean_word_len = false,
        ok_symbol_ratio = false, ok_bullet_lines = false, ok_ellipsis_lines = false,
        ok_alpha_words = false, ok_stopwords = false, pass = false)
    var sumLen = 0L
    var symbolWords = 0L
    var alphaWords = 0L
    val seenStops = new Array[Boolean](stopwords.length)
    words.foreach { w =>
      sumLen += w.codePointCount(0, w.length)
      if (w.contains('#') || w.contains('…') || w.contains("...")) symbolWords += 1
      if (w.exists(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))) alphaWords += 1
      var si = 0
      while (si < stopwords.length) {
        if (!seenStops(si) && w == stopwords(si)) seenStops(si) = true
        si += 1
      }
    }
    val lines = t.split("\n").filter(_.nonEmpty)
    val nLines = math.max(lines.length, 1).toLong
    val bulletLines =
      lines.count(l => l.startsWith("•") || l.startsWith("- ") || l.startsWith("* ")).toLong
    val ellipsisLines = lines.count(l => l.endsWith("…") || l.endsWith("...")).toLong
    val meanLen = sumLen.toDouble / n
    val okWords = n >= minWords && n <= maxWords
    val okMean = meanLen >= minMeanLen && meanLen <= maxMeanLen
    val okSymbol = symbolWords.toDouble / n <= maxSymbolFrac
    val okBullet = bulletLines.toDouble / nLines <= maxBulletFrac
    val okEllipsis = ellipsisLines.toDouble / nLines <= maxEllipsisFrac
    val okAlpha = alphaWords.toDouble / n >= minAlphaFrac
    val okStops = seenStops.count(identity) >= minStopwords
    GopherFlags(n, okWords, okMean, okSymbol, okBullet, okEllipsis, okAlpha, okStops,
      okWords && okMean && okSymbol && okBullet && okEllipsis && okAlpha && okStops)
  }

  /** Add the Gopher rule columns (`n_words`, seven `ok_*` booleans,
    * `pass`). Published defaults; every threshold overridable.
    */
  def withGopherFlags(
      df: DataFrame,
      textCol: String,
      minWords: Long = 50L,
      maxWords: Long = 100000L,
      minMeanLen: Double = 3.0,
      maxMeanLen: Double = 10.0,
      maxSymbolFrac: Double = 0.1,
      maxBulletFrac: Double = 0.9,
      maxEllipsisFrac: Double = 0.3,
      minAlphaFrac: Double = 0.8,
      minStopwords: Int = 2,
  ): DataFrame = {
    val u = udf { (t: String) =>
      gopherFlagsKernel(t, minWords, maxWords, minMeanLen, maxMeanLen,
        maxSymbolFrac, maxBulletFrac, maxEllipsisFrac, minAlphaFrac, minStopwords)
    }
    val flagged = df.withColumn("__g", u(col(textCol)))
    val fields = Seq("n_words", "ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
      "ok_bullet_lines", "ok_ellipsis_lines", "ok_alpha_words", "ok_stopwords", "pass")
    fields.foldLeft(flagged)((d, f) => d.withColumn(f, col(s"__g.$f"))).drop("__g")
  }

  /** Keep only documents passing every Gopher rule. */
  def gopherFilter(df: DataFrame, textCol: String): DataFrame =
    withGopherFlags(df, textCol).where(col("pass"))
      .drop("n_words", "ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
        "ok_bullet_lines", "ok_ellipsis_lines", "ok_alpha_words", "ok_stopwords", "pass")
}
