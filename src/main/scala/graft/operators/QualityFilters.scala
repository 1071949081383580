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
    *
    * ENGLISH-SCOPED in its default form (the published Gopher rules
    * are English-targeted): `stops` is the English stopword list and
    * `unicodeAlpha=false` keeps the paper's ASCII alpha-word test.
    * Unspaced CJK text is one giant whitespace "word", so the
    * word-count and mean-word-length rules always fail — that is a
    * property of the heuristic, not a bug; multilingual corpora
    * should route through [[withGopherFlagsByLang]], which swaps in
    * per-language stopword profiles and passes out-of-scope scripts
    * through to LM-based filtering instead of silently dropping them.
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
      stops: Array[String] = stopwords,
      unicodeAlpha: Boolean = false,
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
    val seenStops = new Array[Boolean](stops.length)
    words.foreach { w =>
      sumLen += w.codePointCount(0, w.length)
      if (w.contains('#') || w.contains('…') || w.contains("...")) symbolWords += 1
      val isAlpha =
        if (unicodeAlpha) w.exists(Character.isLetter)
        else w.exists(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))
      if (isAlpha) alphaWords += 1
      var si = 0
      while (si < stops.length) {
        if (!seenStops(si) && w == stops(si)) seenStops(si) = true
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

  // --------------------------------------- language-conditioned bundle

  /** Languages the word-level Gopher rules are APPLICABLE to: spaced
    * scripts with a frequent-word profile. The first six reuse the
    * lang-id stopword sets ([[TextAnalysis.stopwordProfiles]], sorted
    * for determinism); ru/nl/pl/sv/tr/id/da/pt/ro/cs/vi are
    * hand-entered frequent-word lists (Gopher scoping needs only the
    * language label the caller carries, not lang-id support); all use
    * the Unicode
    * alpha-word test (the ASCII test zeroes alpha counts on Cyrillic
    * and strips accents' evidence). Thresholds stay the published
    * ones — they were tuned on English but transfer reasonably to
    * spaced alphabetic scripts; what does NOT transfer is the word
    * machinery itself on unspaced CJK, which is why those languages
    * are passed through, not filtered.
    */
  private[graft] val langStopwordProfiles: Map[String, Array[String]] =
    TextAnalysis.stopwordProfiles.map { case (l, s) => l -> s.toArray.sorted } ++ Map(
      // Profiles BEYOND the lang-id set live here, NOT in
      // TextAnalysis.stopwordProfiles: adding a language there would
      // shift langIdUdf's best-profile vote and silently re-predict
      // existing corpora (q15/q95/q102/q104 are byte-stable against
      // that). Gopher scoping only needs the label a caller already
      // carries (CLD-style upstream ID, or langIdUdf for its six).
      "ru" -> Array("и", "в", "не", "на", "я", "что", "он", "как", "мы", "это",
        "вы", "с", "по", "но", "они", "она", "за", "к", "у", "от"),
      "nl" -> Array("de", "het", "een", "en", "van", "ik", "te", "dat", "die",
        "in", "is", "niet", "op", "aan", "met", "als", "voor", "er", "maar",
        "om", "hij", "zijn", "dan", "ook", "naar"),
      "pl" -> Array("i", "w", "nie", "na", "się", "z", "do", "to", "że",
        "jest", "jak", "po", "co", "tak", "ale", "o", "za", "od", "przez",
        "przy", "dla", "czy", "tym", "być", "który"),
      "sv" -> Array("och", "att", "det", "som", "en", "på", "är", "av", "för",
        "med", "den", "till", "inte", "har", "de", "han", "hon", "men", "ett",
        "om", "var", "sig", "jag", "vi", "i"),
      "tr" -> Array("bir", "ve", "bu", "da", "de", "için", "ile", "o", "ne",
        "gibi", "daha", "çok", "ama", "ben", "sen", "biz", "var", "yok",
        "olarak", "kadar", "sonra", "her"),
      "id" -> Array("yang", "dan", "di", "itu", "dengan", "untuk", "tidak",
        "ini", "dari", "dalam", "akan", "pada", "juga", "saya", "ke",
        "karena", "ada", "mereka", "kita", "atau"),
      "da" -> Array("og", "i", "det", "at", "en", "den", "til", "er", "som",
        "på", "de", "med", "han", "af", "for", "ikke", "der", "var", "jeg",
        "men", "et", "hun", "om", "hvad"),
      "pt" -> Array("de", "a", "o", "que", "e", "do", "da", "em", "um",
        "para", "é", "com", "não", "uma", "os", "no", "se", "na", "por",
        "mais", "as", "dos", "como", "mas"),
      "ro" -> Array("și", "de", "în", "la", "cu", "pe", "este", "un", "o",
        "ce", "nu", "se", "din", "care", "mai", "pentru", "dar", "sunt",
        "lui", "ca"),
      "cs" -> Array("a", "se", "na", "je", "v", "že", "s", "z", "do", "to",
        "jak", "ale", "po", "co", "pro", "za", "od", "nebo", "tak", "který",
        "jsou", "být"),
      "vi" -> Array("và", "của", "là", "có", "trong", "được", "cho", "không",
        "người", "này", "với", "các", "một", "những", "khi", "đã", "để",
        "ra", "cũng", "như"))
      .map { case (l, s) => l -> s.sorted }

  /** [[withGopherFlags]] conditioned on a language column: documents
    * whose language has a word-rule profile get the full bundle with
    * that language's stopword list and the Unicode alpha test;
    * documents outside the profile set (unspaced CJK, unknown "und",
    * unprofiled languages) get `gopher_scoped=false` and `pass=true` —
    * they are NOT silently dropped but passed through for the
    * LM-based path ([[CorpusPipeline.ccnet]]'s per-language perplexity
    * buckets) to judge. This is the documented recourse for the
    * English-only published heuristic on a multilingual corpus.
    */
  def withGopherFlagsByLang(
      df: DataFrame,
      textCol: String,
      langCol: String,
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
    val profiles = langStopwordProfiles
    val u = udf { (t: String, lang: String) =>
      profiles.get(if (lang == null) "und" else lang) match {
        case Some(stops) =>
          val f = gopherFlagsKernel(t, minWords, maxWords, minMeanLen, maxMeanLen,
            maxSymbolFrac, maxBulletFrac, maxEllipsisFrac, minAlphaFrac, minStopwords,
            stops = stops, unicodeAlpha = true)
          (true, f)
        case None =>
          val f = gopherFlagsKernel(t, minWords, maxWords, minMeanLen, maxMeanLen,
            maxSymbolFrac, maxBulletFrac, maxEllipsisFrac, minAlphaFrac, minStopwords)
          // out-of-scope language: report the (English-scoped) rule
          // outcomes for observability but force pass — the LM path
          // owns the keep/drop decision
          (false, f.copy(pass = true))
      }
    }
    val flagged = df.withColumn("__gl", u(col(textCol), col(langCol)))
    val fields = Seq("n_words", "ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
      "ok_bullet_lines", "ok_ellipsis_lines", "ok_alpha_words", "ok_stopwords", "pass")
    fields
      .foldLeft(flagged.withColumn("gopher_scoped", col("__gl._1")))(
        (d, f) => d.withColumn(f, col(s"__gl._2.$f")))
      .drop("__gl")
  }

  /** Language-conditioned keep: profile languages must pass their
    * bundle; out-of-scope languages pass through (LM path decides).
    */
  def gopherFilterByLang(df: DataFrame, textCol: String, langCol: String): DataFrame =
    withGopherFlagsByLang(df, textCol, langCol).where(col("pass"))
      .drop("gopher_scoped", "n_words", "ok_word_count", "ok_mean_word_len",
        "ok_symbol_ratio", "ok_bullet_lines", "ok_ellipsis_lines", "ok_alpha_words",
        "ok_stopwords", "pass")

  // ------------------------------------------------------------ C4 rules

  final case class C4Flags(
      clean_text: String,
      n_lines_kept: Long,
      n_lines_dropped: Long,
      n_sentences: Long,
      has_lorem_ipsum: Boolean,
      has_brace: Boolean,
      has_bad_word: Boolean,
      has_drop_phrase: Boolean,
      pass: Boolean,
  )

  /** Line phrases whose presence drops the line (C4's "javascript"
    * rule plus the boilerplate policy phrases its cleaner removes).
    * Matched case-insensitively as substrings of the line.
    */
  val defaultC4DropPhrases: Seq[String] = Seq(
    "javascript", "privacy policy", "terms of use", "cookie policy",
    "uses cookies", "use of cookies")

  /** Soft-404 / placeholder-page phrases (the RefinedWeb-style
    * DOCUMENT-level drop: an HTTP-200 page whose body is an error or
    * parking notice). Matched case-insensitively as substrings of the
    * retained text via the `docPhrases` parameter — off by default.
    */
  val defaultSoft404Phrases: Seq[String] = Seq(
    "page not found", "404 error", "error 404", "access denied",
    "this page does not exist", "domain is for sale",
    "under construction", "default web page")

  /** Drop soft-404 / parking placeholder pages: any document whose
    * text contains one of `phrases` (case-insensitive substring) is
    * removed. The document-level [[defaultSoft404Phrases]] preset as a
    * STANDALONE filter — [[withC4Flags]]'s `docPhrases` applies the
    * same rule but only alongside the full C4 line rules; pipelines
    * that want the error-page drop without line cleaning use this.
    * Pure codegen projection+filter (lower/contains, no UDF):
    * shuffle-free, stream-safe, scan-scaled.
    */
  def dropSoft404(
      df: DataFrame,
      textCol: String,
      phrases: Seq[String] = defaultSoft404Phrases,
  ): DataFrame = {
    require(phrases.nonEmpty, "phrases must be non-empty")
    val lowered = lower(col(textCol))
    val hit = phrases
      .map(p => lowered.contains(p.toLowerCase(java.util.Locale.ROOT)))
      .reduce(_ || _)
    df.where(!coalesce(hit, lit(false)))
  }

  /** One-pass C4 cleaning kernel (Raffel et al. 2020, §2.2 "C4"):
    * line level — keep only lines with ≥ `minLineWords` whitespace
    * words that end in a terminal punctuation mark (`.` `!` `?` `"`
    * `”`) and contain no drop phrase; document level — the retained
    * text must hold ≥ `minSentences` sentences and must not contain
    * "lorem ipsum", a curly brace (the code-exclusion rule), or any
    * word on the `badwords` list. Documented simplifications, chosen
    * so every step is integer/string-exact and replayable by the
    * DuckDB oracle: sentences are counted as occurrences of `.` `!`
    * `?` in the retained text (C4 uses an English sentence splitter),
    * and bad words are matched against the shared Unicode word
    * tokenization ([[graft.textutil.TextHash.WordSplitRe]]) of the
    * lowercased retained text rather than a boundary regex.
    *
    * Cross-engine parity details (same conventions as
    * [[gopherFlagsKernel]]): lines split on `\n` KEEPING trailing
    * empties (DuckDB `string_split` semantics), line words split on
    * the explicit class `[ \t\f\r]+`, phrase matching on
    * `toLowerCase(Locale.ROOT)` (ASCII-identical to DuckDB `lower`
    * regardless of host locale — same convention as
    * [[graft.textutil.TextHash.tokenize]]).
    */
  private[graft] def c4Kernel(
      text: String,
      minLineWords: Int,
      minSentences: Int,
      dropPhrases: Array[String],
      badwords: Array[String],
      docPhrases: Array[String] = Array.empty,
  ): C4Flags = {
    val t = if (text == null) "" else text
    val lines = t.split("\n", -1)
    val kept = lines.filter { l =>
      val words = l.split("[ \t\f\r]+").count(_.nonEmpty)
      val lower = l.toLowerCase(java.util.Locale.ROOT)
      words >= minLineWords &&
      l.nonEmpty &&
      (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") ||
        l.endsWith("\"") || l.endsWith("”")) &&
      !dropPhrases.exists(lower.contains)
    }
    val clean = kept.mkString("\n")
    var sentences = 0L
    var i = 0
    while (i < clean.length) {
      val c = clean.charAt(i)
      if (c == '.' || c == '!' || c == '?') sentences += 1
      i += 1
    }
    val cleanLower = clean.toLowerCase(java.util.Locale.ROOT)
    val lorem = cleanLower.contains("lorem ipsum")
    val brace = clean.contains("{")
    val bad = badwords.nonEmpty && {
      val toks = graft.textutil.TextHash.tokenize(cleanLower)
      badwords.exists(b => toks.contains(b))
    }
    val docPhrase = docPhrases.exists(cleanLower.contains)
    C4Flags(clean, kept.length.toLong, (lines.length - kept.length).toLong, sentences,
      lorem, brace, bad, docPhrase,
      sentences >= minSentences && !lorem && !brace && !bad && !docPhrase)
  }

  /** Add the C4 cleaning columns: `clean_text` (the line-filtered
    * text), line bookkeeping, the sentence count, and the document
    * rule booleans + `pass`. Pure per-row map — no shuffle, streams
    * at any scale; the published rule set is the standard web-corpus
    * pre-filter ahead of Gopher/LM scoring.
    */
  def withC4Flags(
      df: DataFrame,
      textCol: String,
      minLineWords: Int = 5,
      minSentences: Int = 3,
      dropPhrases: Seq[String] = defaultC4DropPhrases,
      badwords: Seq[String] = Nil,
      docPhrases: Seq[String] = Nil,
  ): DataFrame = {
    val dp = dropPhrases.map(_.toLowerCase(java.util.Locale.ROOT)).toArray
    val bw = badwords.map(_.toLowerCase(java.util.Locale.ROOT)).toArray
    val dpp = docPhrases.map(_.toLowerCase(java.util.Locale.ROOT)).toArray
    val u = udf { (t: String) => c4Kernel(t, minLineWords, minSentences, dp, bw, dpp) }
    val flagged = df.withColumn("__c4", u(col(textCol)))
    val fields = Seq("clean_text", "n_lines_kept", "n_lines_dropped", "n_sentences",
      "has_lorem_ipsum", "has_brace", "has_bad_word", "has_drop_phrase", "pass")
    fields.foldLeft(flagged)((d, f) => d.withColumn(f, col(s"__c4.$f"))).drop("__c4")
  }

  /** Keep passing documents with their line-filtered text substituted
    * into `textCol` (the C4 output corpus).
    */
  def c4Clean(
      df: DataFrame,
      textCol: String,
      minLineWords: Int = 5,
      minSentences: Int = 3,
      dropPhrases: Seq[String] = defaultC4DropPhrases,
      badwords: Seq[String] = Nil,
      docPhrases: Seq[String] = Nil,
  ): DataFrame =
    withC4Flags(df, textCol, minLineWords, minSentences, dropPhrases, badwords, docPhrases)
      .where(col("pass"))
      .withColumn(textCol, col("clean_text"))
      .drop("clean_text", "n_lines_kept", "n_lines_dropped", "n_sentences",
        "has_lorem_ipsum", "has_brace", "has_bad_word", "has_drop_phrase", "pass")

  final case class LineSignalStats(
      n_lines_ls: Long,
      max_line_len: Long,
      sum_line_len: Long,
      avg_line_len: Double,
      n_alnum_cp: Long,
      n_cp: Long,
      frac_alnum: Option[Double],
  )

  /** Line-shape signals — the code/structured-text filters of The
    * Stack / StarCoder pipelines (max and mean line length, ASCII
    * alphanumeric fraction): minified JS, base64 blobs, and data
    * tables have extreme line lengths or alnum fractions that
    * prose-calibrated word heuristics never see. Conventions are
    * oracle-replayable: lines split on `\n` KEEPING trailing empties
    * (SQL `string_split` semantics — Java's default `split` drops
    * them and would disagree with every engine's), lengths count
    * Unicode CODE POINTS (SQL `length`; `String.length` counts UTF-16
    * units and double-counts astral chars), `avg_line_len` excludes
    * the newline separators (`sum_line_len / n_lines`), `frac_alnum`
    * counts `[a-zA-Z0-9]` over ALL code points including separators
    * (null for empty text). Both divisions are single IEEE ops on
    * integer-valued operands, so they replay bit-exactly.
    */
  private[graft] def lineSignalsKernel(text: String): LineSignalStats = {
    val t = if (text == null) "" else text
    val lines = t.split("\n", -1)
    var maxLen = 0L
    var sumLen = 0L
    lines.foreach { l =>
      val cp = l.codePointCount(0, l.length).toLong
      if (cp > maxLen) maxLen = cp
      sumLen += cp
    }
    var alnum = 0L
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9'))
        alnum += 1
      i += 1
    }
    val total = t.codePointCount(0, t.length).toLong
    LineSignalStats(
      lines.length.toLong, maxLen, sumLen,
      sumLen.toDouble / lines.length,
      alnum, total,
      if (total == 0L) None else Some(alnum.toDouble / total))
  }

  /** Add `n_lines_ls`, `max_line_len`, `sum_line_len`, `avg_line_len`,
    * `n_alnum_cp`, `n_cp`, `frac_alnum` — pure per-row map, no
    * shuffle.
    */
  def withLineSignals(df: DataFrame, textCol: String): DataFrame = {
    val u = udf { (t: String) => lineSignalsKernel(t) }
    val fields = Seq("n_lines_ls", "max_line_len", "sum_line_len", "avg_line_len",
      "n_alnum_cp", "n_cp", "frac_alnum")
    val flagged = df.withColumn("__ls", u(col(textCol)))
    fields.foldLeft(flagged)((d, f) => d.withColumn(f, col(s"__ls.$f"))).drop("__ls")
  }

  final case class CompressibilityStats(
      raw_len: Long,
      deflate_len: Long,
      compression_ratio: Option[Double],
  )

  /** zlib compressibility — the cheap whole-document
    * repetition/boilerplate detector (deflate ratio over UTF-8 bytes):
    * templated or copy-pasted text compresses far below prose
    * (ratio < ~0.15 at a 32 KB deflate window), while encrypted/
    * base64/hex payloads sit ABOVE prose (> ~0.5 — deflate cannot
    * beat the payload's byte entropy). Catches repetition at ANY unit
    * size in one pass where n-gram ratios need the right `n`.
    *
    * The RATIO is the signal; the exact `deflate_len` is
    * deterministic for a fixed zlib build + level but NOT pinned
    * across zlib versions, so correctness gates classify against
    * wide-margin thresholds rather than asserting byte counts.
    * Per-row Deflater with explicit `end()` — no shared native state
    * across rows; at 100 TB this is a scan-bound CPU kernel (~100
    * MB/s/core, the same order as the signature kernels).
    */
  private[graft] def compressibilityKernel(text: String, level: Int): CompressibilityStats = {
    val bytes =
      (if (text == null) "" else text).getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (bytes.isEmpty) return CompressibilityStats(0L, 0L, None)
    val d = new java.util.zip.Deflater(level)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var out = 0L
      while (!d.finished()) out += d.deflate(buf)
      CompressibilityStats(bytes.length.toLong, out, Some(out.toDouble / bytes.length))
    } finally d.end()
  }

  /** Add `raw_len`, `deflate_len`, `compression_ratio` — pure per-row
    * map, no shuffle.
    */
  def withCompressibility(df: DataFrame, textCol: String, level: Int = 6): DataFrame = {
    require(level >= 0 && level <= 9, s"deflate level must be in [0,9]: $level")
    val u = udf { (t: String) => compressibilityKernel(t, level) }
    val fields = Seq("raw_len", "deflate_len", "compression_ratio")
    val flagged = df.withColumn("__cz", u(col(textCol)))
    fields.foldLeft(flagged)((d, f) => d.withColumn(f, col(s"__cz.$f"))).drop("__cz")
  }
}
