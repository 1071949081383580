package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.textutil.TextHash

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, and document
  * fingerprinting. All per-row and shuffle-free: they compile to
  * whole-stage-codegen'd expressions or deterministic scalar UDFs, so
  * they scan-scale linearly to any input size.
  */
object TextAnalysis {

  // ------------------------------------------------------- canonicalization

  /** Canonicalize a text column before hashing/dedup: Unicode NFC
    * (composed and decomposed encodings of the same text — "café" as
    * U+00E9 vs e+U+0301 — become byte-identical, so exact dedup,
    * shingles, and line hashes treat them as the duplicates they
    * are), with optional whitespace collapse (runs → one space,
    * trimmed) and case folding. Column-only, fully codegen
    * ([[graft.functions.TextSignatures.unicodeNormalize]] is a native
    * expression with an ASCII zero-copy fast path), so at corpus
    * scale this rides the existing scan — no extra pass, no shuffle.
    * The NFC face replays in DuckDB as `nfc_normalize` (gate q108).
    */
  def canonicalize(
      text: Column,
      form: String = "NFC",
      collapseWhitespace: Boolean = false,
      caseFold: Boolean = false,
  ): Column = {
    val normed = graft.functions.TextSignatures.unicodeNormalize(text, form)
    val ws = if (collapseWhitespace) trim(regexp_replace(normed, "\\s+", " ")) else normed
    if (caseFold) lower(ws) else ws
  }

  // ------------------------------------------------------------ tokenizing

  /** Whitespace token count, codegen-friendly (no UDF). Empty/blank
    * text counts 0.
    */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** Corpus token vocabulary: one row per distinct token with its
    * term frequency and document frequency — the vocabulary-building
    * scan every tokenizer/filter-list pipeline starts from.
    * Tokenization matches the dedup operators (lowercase, split on
    * non-word runs, drop empties).
    *
    * Scale shape: explode → two-phase aggregate. `tf` partial-
    * aggregates map-side (skewed common tokens combine before the
    * shuffle); exact `df` expands to distinct (token, doc) pairs
    * first — the standard exact-distinct plan, whose shuffle width is
    * the distinct pair count, not the token stream.
    */
  def tokenVocabulary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("__doc"),
      explode(filter(split(lower(col(textCol)), TextHash.WordSplitRe), t => t =!= lit(""))).as("token"),
    )
      .groupBy("token")
      .agg(count(lit(1)).as("tf"), countDistinct(col("__doc")).as("df"))

  /** BPE-ish subword token count: splits on word/number/punct
    * boundaries like a GPT-2-style pre-tokenizer (letters runs, digit
    * runs, single punct marks), then charges ~1 token per 4 chars of
    * each long word run. Pure expression arithmetic — an upper-bound
    * estimator without a vocab file.
    */
  def bpeTokenEstimate(text: Column): Column = {
    val words = size(split(trim(text), "\\s+"))
    val chars = length(regexp_replace(text, "\\s+", ""))
    // letters beyond 4 per word cost extra subword tokens; punct runs split
    val punct = length(regexp_replace(text, "[\\p{L}\\p{N}\\s]+", ""))
    when(length(trim(text)) === 0, lit(0))
      .otherwise(greatest(words, ceil(chars.cast("double") / 4).cast("int")) + punct)
  }

  // --------------------------------------------------------- quality score

  /** Per-document quality statistics (length, punctuation/digit/upper
    * ratios, mean token length, stopword ratio) — the classic cheap
    * heuristics used to filter web-scale corpora. All built-in
    * expressions; emitted as separate columns so downstream filters
    * prune on whichever they need.
    */
  def qualityStats(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val nChars = length(t)
    val nTokens = tokenCount(t)
    val safeChars = greatest(nChars, lit(1)).cast("double")
    val punct = length(regexp_replace(t, "[^.,;:!?'\"()\\[\\]{}-]", ""))
    val digits = length(regexp_replace(t, "[^0-9]", ""))
    val uppers = length(regexp_replace(t, "[^A-Z]", ""))
    val stopHits = size(
      filter(
        split(lower(trim(t)), "\\s+"),
        w => w.isInCollection(EnStopwords),
      ),
    )
    df.withColumn("n_chars_calc", nChars)
      .withColumn("n_tokens", nTokens)
      .withColumn("punct_ratio", punct / safeChars)
      .withColumn("digit_ratio", digits / safeChars)
      .withColumn("upper_ratio", uppers / safeChars)
      .withColumn(
        "mean_token_len",
        when(nTokens === 0, lit(0.0))
          .otherwise(length(regexp_replace(t, "\\s+", "")).cast("double") / nTokens),
      )
      .withColumn(
        "stopword_ratio",
        when(nTokens === 0, lit(0.0)).otherwise(stopHits.cast("double") / nTokens),
      )
  }

  /** Composite [0,1] quality score from [[qualityStats]] columns —
    * monotone penalties for extreme length, punctuation soup, digit
    * soup, and stopword-free (likely non-prose) text.
    */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val s = qualityStats(df, textCol)
    val lenScore = least(col("n_tokens").cast("double") / 20.0, lit(1.0))
    val punctPenalty = least(col("punct_ratio") * 4.0, lit(1.0))
    val digitPenalty = least(col("digit_ratio") * 4.0, lit(1.0))
    val stopScore = least(col("stopword_ratio") * 3.0, lit(1.0))
    s.withColumn(
      "quality_score",
      (lenScore * (lit(1.0) - punctPenalty * 0.5) * (lit(1.0) - digitPenalty * 0.5) *
        (lit(0.5) + stopScore * 0.5)),
    )
  }

  /** Gopher/C4-style repetition statistics — the boilerplate/spam
    * signals length-and-punctuation heuristics miss:
    *   - `dup_line_ratio`: fraction of lines that repeat an earlier
    *     line (0 for single-line docs)
    *   - `top_bigram_ratio`: share of all word bigrams taken by the
    *     single most frequent bigram (high → "buy now buy now …")
    *   - `max_char_run`: longest run of one repeated character
    * Per-row scalar UDF, shuffle-free; compose with
    * [[qualityStats]]/[[qualityScore]] filters.
    */
  val repetitionStatsUdf = udf { (text: String) =>
    if (text == null || text.trim.isEmpty) (0.0, 0.0, 0)
    else {
      val lines = text.split("\n").map(_.trim).filter(_.nonEmpty)
      val dupLines =
        if (lines.length <= 1) 0.0
        else (lines.length - lines.distinct.length).toDouble / lines.length
      val toks = TextHash.tokenize(text)
      val topBigram =
        if (toks.length < 2) 0.0
        else {
          val counts = scala.collection.mutable.HashMap.empty[String, Int]
          var i = 0
          while (i < toks.length - 1) {
            val k = toks(i) + " " + toks(i + 1)
            counts.update(k, counts.getOrElse(k, 0) + 1)
            i += 1
          }
          counts.values.max.toDouble / (toks.length - 1)
        }
      var maxRun = 1
      var run = 1
      var i = 1
      while (i < text.length) {
        if (text.charAt(i) == text.charAt(i - 1)) { run += 1; if (run > maxRun) maxRun = run }
        else run = 1
        i += 1
      }
      (dupLines, topBigram, maxRun)
    }
  }

  def withRepetitionStats(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("__rep", repetitionStatsUdf(col(textCol)))
      .withColumn("dup_line_ratio", col("__rep._1"))
      .withColumn("top_bigram_ratio", col("__rep._2"))
      .withColumn("max_char_run", col("__rep._3"))
      .drop("__rep")

  /** Word-level repetition signals as a NATIVE one-pass expression
    * (no UDF serde, stays in whole-stage codegen): token counts,
    * distinct-token count, most-frequent-token share, and the
    * duplicate fraction of word bigram/trigram occurrences — the
    * Gopher repetition filters over `[^\p{L}\p{N}_]+` tokens, exact string
    * identity so the DuckDB oracle matches bit-for-bit. Shuffle-free;
    * compose with [[qualityScore]] / [[withRepetitionStats]] (which
    * adds the line- and char-level signals).
    */
  def withNgramRepetition(df: DataFrame, textCol: String): DataFrame = {
    val rs = graft.functions.TextSignatures.repetitionStats(col(textCol))
    // word-scoped names ([^\p{L}\p{N}_]+ tokens) — never collides with the
    // whitespace-token n_tokens from qualityStats, so the two
    // operators compose in either order
    df.withColumn("__rs", rs)
      .withColumn("n_word_tokens", col("__rs.n_word_tokens"))
      .withColumn("n_distinct_words", col("__rs.n_distinct_words"))
      .withColumn("top_token_frac", col("__rs.top_token_frac"))
      .withColumn("dup_bigram_frac", col("__rs.dup_bigram_frac"))
      .withColumn("dup_trigram_frac", col("__rs.dup_trigram_frac"))
      .drop("__rs")
  }

  val EnStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "but", "if", "of", "to", "in", "on", "at",
    "for", "with", "by", "from", "as", "is", "are", "was", "were", "be",
    "been", "it", "this", "that", "these", "those", "not", "no", "he", "she",
    "they", "we", "you", "i",
  )

  // ------------------------------------------------------------ language ID

  private[graft] val stopwordProfiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
      "on", "are", "with", "as", "his", "they", "at", "be", "this", "have",
      "from", "or", "had", "by", "not", "but", "what", "all", "were", "we"),
    "de" -> Set("der", "die", "das", "und", "ist", "ich", "nicht", "sie", "du",
      "wir", "ein", "eine", "mit", "für", "auf", "den", "dem", "des", "im",
      "zu", "von", "sich", "auch", "als", "es", "an", "werden", "aus", "er"),
    "fr" -> Set("le", "la", "les", "de", "des", "un", "une", "et", "est", "en",
      "que", "qui", "dans", "pour", "pas", "sur", "avec", "il", "elle",
      "nous", "vous", "ils", "au", "aux", "ce", "cette", "son", "ses", "mais"),
    "es" -> Set("el", "la", "los", "las", "de", "del", "un", "una", "y", "es",
      "en", "que", "por", "para", "con", "no", "se", "su", "al", "lo", "como",
      "más", "pero", "sus", "le", "ya", "o", "este", "sí", "porque"),
    "it" -> Set("il", "lo", "la", "gli", "le", "di", "che", "è", "e", "un",
      "una", "per", "con", "non", "si", "da", "come", "anche", "ma", "del",
      "della", "nel", "alla", "più", "sono", "questo", "questa", "ha", "io"),
    "pt" -> Set("o", "a", "os", "as", "de", "do", "da", "dos", "das", "um",
      "uma", "e", "é", "em", "que", "para", "com", "não", "se", "por", "mais",
      "como", "mas", "foi", "ao", "ele", "sua", "seu", "está", "são"),
  )

  /** Heuristic language ID: script detection first (CJK/kana/hangul/
    * cyrillic by Unicode block ratio), then best stopword-profile hit
    * for Latin scripts; "und" when nothing scores. Deterministic scalar
    * UDF — no shuffle, no external model.
    */
  val langIdUdf = udf { (text: String) =>
    if (text == null || text.trim.isEmpty) "und"
    else {
      var cjk = 0; var kana = 0; var hangul = 0; var cyr = 0; var letters = 0
      text.foreach { ch =>
        val b = Character.UnicodeBlock.of(ch)
        if (Character.isLetter(ch)) {
          letters += 1
          if (b == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS) cjk += 1
          else if (b == Character.UnicodeBlock.HIRAGANA || b == Character.UnicodeBlock.KATAKANA) kana += 1
          else if (b == Character.UnicodeBlock.HANGUL_SYLLABLES) hangul += 1
          else if (b == Character.UnicodeBlock.CYRILLIC) cyr += 1
        }
      }
      if (letters == 0) "und"
      else if (kana.toDouble / letters > 0.1) "ja"
      else if (cjk.toDouble / letters > 0.3) "zh"
      else if (hangul.toDouble / letters > 0.3) "ko"
      else if (cyr.toDouble / letters > 0.3) "ru"
      else {
        val tokens = TextHash.tokenize(text)
        if (tokens.isEmpty) "und"
        else {
          val scores = stopwordProfiles.view.mapValues { sw =>
            tokens.count(sw.contains).toDouble / tokens.length
          }.toMap
          val (best, score) = scores.maxBy { case (l, s) => (s, l) }
          if (score < 0.03) "und" else best
        }
      }
    }
  }

  def withLangId(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("lang_pred", langIdUdf(col(textCol)))

  // --------------------------------------------------------- fingerprinting

  /** 64-bit content fingerprint: FNV-1a over whitespace-normalized
    * text. Equal fingerprint ⇒ (near-certainly) equal normalized
    * content — the cheap exact-dup key that avoids shuffling full text.
    */
  private[graft] def contentFingerprint(text: String): Long =
    if (text == null) 0L
    else {
      val norm = text.trim.replaceAll("\\s+", " ")
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < norm.length) {
        h ^= norm.charAt(i)
        h *= 0x100000001b3L
        i += 1
      }
      h
    }

  val contentFingerprintUdf = udf { (text: String) => contentFingerprint(text) }

  /** Winnowing fingerprints (Schleimer et al., SIGMOD'03): rolling
    * polynomial hash over character k-grams, minimum per window of w —
    * a sparse, position-robust signature set for near-dup and overlap
    * detection. Returns a sorted distinct LongArray; ~2/(w+1) density.
    */
  def winnowingUdf(k: Int = 8, w: Int = 4) = udf { (text: String) =>
    if (text == null) Array.empty[Long]
    else graft.textutil.TextHash.winnowSignature(text, k, w)
  }

  def withFingerprints(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("fingerprint", contentFingerprintUdf(col(textCol)))
      .withColumn(
        "winnow_sig",
        coalesce(
          graft.functions.TextSignatures.winnowSignature(col(textCol), 8, 4),
          typedLit(Array.empty[Long]),
        ),
      )

  // ----------------------------------------------------------- pii redaction

  /** PII patterns restricted to syntax whose semantics are IDENTICAL
    * in Java regex (Spark) and RE2 (the DuckDB oracle): character
    * classes, bounded/greedy quantifiers, `\b`, `\d` — no lookaround,
    * no backrefs.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+?\\d[\\d() -]{6,}\\d\\b"

  /** PII redaction — the standard pre-training scrub: emails, IPv4
    * addresses, then phone-like digit runs replaced by typed
    * placeholders (order matters and is part of the contract: IPs are
    * redacted before the phone pass can eat their digits). Pure
    * codegen regexp_replace, shuffle-free, scan-scaled.
    */
  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    val r = regexp_replace(
      regexp_replace(
        regexp_replace(col(textCol), EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      PhoneRe, "[PHONE]")
    df.withColumn("redacted", r).withColumn("pii_found", r =!= col(textCol))
  }

  /** In-DOCUMENT repeated-PARAGRAPH trimming — [[dedupLinesInDoc]] at
    * the [[Dedup.paragraphDedup]] granularity (units split on
    * `\n{2,}`, rebuilt with `\n\n`, first spelling kept, trimmed-form
    * comparison, short units always kept): repeated whole blocks
    * within one document (pasted duplicates, per-page banners in a
    * concatenated capture) collapse without touching any other
    * document. Pure per-row map, streams as-is — the streaming
    * pipeline's paragraph-granularity stage, where the corpus-wide
    * winner aggregation of the batch operator cannot run.
    */
  def dedupParagraphsInDoc(
      df: DataFrame,
      textCol: String,
      outCol: String = "text_para_deduped",
      minParagraphChars: Int = 5,
  ): DataFrame = {
    val u = udf { (text: String) =>
      if (text == null) null
      else {
        val seen = scala.collection.mutable.HashSet.empty[String]
        text
          .split("\n{2,}", -1)
          .iterator
          .filter { p =>
            val k = p.trim
            k.length < minParagraphChars || seen.add(k)
          }
          .mkString("\n\n")
      }
    }
    df.withColumn(outCol, u(col(textCol)))
  }

  /** In-DOCUMENT repeated-line trimming (the MassiveText/Gopher
    * in-doc counterpart of the corpus-wide [[Dedup.lineDedup]]):
    * within each document, keep only the FIRST occurrence of every
    * line, compared on its trimmed form but kept in its original
    * spelling — navigation blocks, repeated headers, and pasted
    * duplicates collapse without touching any other document. Lines
    * whose TRIMMED form is shorter than `minLineChars` (blank
    * paragraph separators, list bullets, code braces) are always
    * kept — the same exemption, with the same default, as the
    * corpus-wide sibling: deduping those would shred document
    * structure (every paragraph break after the first would vanish)
    * for no curation gain. Pure per-row map: one pass, a per-doc
    * hash set of line keys, shuffle-free, streams as-is.
    */
  def dedupLinesInDoc(
      df: DataFrame,
      textCol: String,
      outCol: String = "text_line_deduped",
      minLineChars: Int = 5,
  ): DataFrame = {
    val u = udf { (text: String) =>
      if (text == null) null
      else {
        val seen = scala.collection.mutable.HashSet.empty[String]
        text
          .split("\n", -1)
          .iterator
          .filter { l =>
            val k = l.trim
            k.length < minLineChars || seen.add(k)
          }
          .mkString("\n")
      }
    }
    df.withColumn(outCol, u(col(textCol)))
  }

  // --------------------------------------------------------------- chunking

  /** Context-window chunking: each document becomes token windows of
    * `window` whitespace tokens advancing by `stride` (overlapping
    * when stride < window) — the standard pre-training segmentation.
    * All codegen expressions (split/sequence/transform/slice — no
    * UDF); fan-out is explicit via posexplode so downstream row
    * counts are plannable. Output: (id, chunk_idx, chunk_text,
    * n_chunk_tokens); the final (possibly short) window starts at the
    * last stride offset < token count.
    */
  def chunkTokens(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      stride: Int,
  ): DataFrame = chunkTokensCarry(df, idCol, textCol, window, stride, Nil)

  /** [[chunkTokens]] carrying extra per-document columns through to
    * every chunk row (r22, guide §2.4): the chunk fan-out is a pure
    * projection + posexplode — carried columns cost no exchange here,
    * while re-attaching them downstream (webIngest's url/lang attrs)
    * costs an id-keyed join of the whole chunk frame.
    */
  private[graft] def chunkTokensCarry(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      stride: Int,
      carry: Seq[String],
  ): DataFrame = {
    require(window > 0 && stride > 0, "window and stride must be positive")
    val carried = carry.map(col)
    df.select(
        Seq(
          col(idCol),
          expr(s"filter(split(trim($textCol), '\\\\s+'), x -> x != '')").as("w"),
        ) ++ carried: _*)
      .withColumn(
        "nchunks",
        when(size(col("w")) === 0, lit(0))
          .otherwise(expr(s"(size(w) - 1) div $stride").cast("int") + 1),
      )
      .select(
        Seq(
          col(idCol),
          col("w"),
          posexplode(
            expr(
              s"""CASE WHEN nchunks = 0 THEN CAST(array() AS array<string>)
                 |ELSE transform(sequence(0, nchunks - 1),
                 |  i -> array_join(slice(w, i * $stride + 1, least($window, size(w) - i * $stride)), ' '))
                 |END""".stripMargin,
            ),
          ).as(Seq("chunk_idx", "chunk_text")),
        ) ++ carried: _*)
      .select(
        Seq(
          col(idCol),
          col("chunk_idx").cast("bigint").as("chunk_idx"),
          col("chunk_text"),
          least(lit(window), size(col("w")) - col("chunk_idx") * stride)
            .cast("bigint")
            .as("n_chunk_tokens"),
        ) ++ carried: _*)
  }

  // ------------------------------------------------------- content sampling

  /** Deterministic content-addressed Bernoulli sample: keep rows whose
    * md5(text) starts with one of `keepPrefixes` (fraction =
    * |prefixes|/16 per hex char). Unlike `rand(seed)` this is stable
    * across engines, partitionings, reruns and cluster sizes — the
    * reproducible-subcorpus primitive for ablation runs. Filter
    * pushes to the scan; no shuffle.
    */
  def contentSample(
      df: DataFrame,
      textCol: String,
      keepPrefixes: Seq[String] = Seq("0"),
  ): DataFrame =
    df.where(substring(md5(col(textCol)), 1, 1).isInCollection(keepPrefixes))

  // --------------------------------------------------------- corpus rollup

  /** Per-group corpus statistics (docs, tokens, chars, mean doc
    * length) — the corpus report a data pipeline emits per language /
    * source / shard. One hash aggregation with map-side partials;
    * decimal-free (counts and integer sums are order-independent as
    * is, the one ratio is computed from exact sums).
    */
  def corpusStats(df: DataFrame, textCol: String, groupCols: Seq[String]): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokenCount(col(textCol)).cast("bigint")).as("total_tokens"),
        sum(length(col(textCol)).cast("bigint")).as("total_chars"),
        (sum(tokenCount(col(textCol)).cast("bigint")).cast("double") / count(lit(1)))
          .as("mean_tokens_per_doc"),
      )

  /** SNAPSHOT DIFF between two corpus versions keyed by `idCol`: one
    * row per id present in either side with
    * `status ∈ {added, removed, changed, unchanged}` plus both
    * content fingerprints (md5) — the audit a versioned-corpus
    * pipeline runs between crawls/releases before deciding what to
    * re-embed, re-dedup, or re-train on (pair with
    * [[graft.operators.Dedup.nearDupNewDocs]] on the `added` slice
    * and [[graft.operators.WebText.latestCapture]] upstream).
    *
    * Ids are the snapshot's primary key by contract — a duplicated id
    * within one side joins multiplicatively, exactly as a duplicated
    * key does in any diff.
    *
    * Scale shape: each side reduces to (id, md5) BEFORE the join, so
    * document text never shuffles; the full-outer equi-join on id is
    * the one exchange per side (bucketed/pre-partitioned snapshots
    * join co-located). Status is a pure projection over the join.
    */
  def corpusDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      textCol: String,
  ): DataFrame = {
    // presence is tracked with explicit markers, NOT fingerprint
    // nullity — md5(NULL text) is NULL, and a null-text row (an
    // extraction-failure record) present on both sides must read
    // unchanged/changed, never added/removed
    val o = oldDf.select(
      col(idCol).as("id"), md5(col(textCol)).as("old_fp"), lit(true).as("__in_old"))
    val n = newDf.select(
      col(idCol).as("id"), md5(col(textCol)).as("new_fp"), lit(true).as("__in_new"))
    o.join(n, Seq("id"), "full_outer")
      .withColumn(
        "status",
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(col("old_fp") <=> col("new_fp"), lit("unchanged"))
          .otherwise(lit("changed")))
      .drop("__in_old", "__in_new")
  }

  /** Per-group token-length quantiles with BOUNDED aggregation state —
    * the unbounded-group companion to q55's exact `percentile` (which
    * holds a whole group's values in one buffer). `approx_percentile`
    * (Greenwald-Khanna) keeps O(1/ε) state per group regardless of
    * group size; `accuracy` is Spark's 1/ε knob (10000 ≈ rank error
    * ≤ 0.01%). Use the exact form when group cardinality is small and
    * bounded (per-source panels), this one when groups can be
    * arbitrarily large (per-domain over the open web).
    */
  def tokenQuantilesApprox(
      df: DataFrame,
      textCol: String,
      groupCols: Seq[String],
      percentiles: Seq[Double] = Seq(0.5, 0.95, 0.99),
      accuracy: Int = 10000,
  ): DataFrame = {
    val pList = percentiles.mkString("array(", ", ", ")")
    df.select(groupCols.map(col) :+ tokenCount(col(textCol)).cast("double").as("__n"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        expr(s"approx_percentile(__n, $pList, $accuracy)").as("__qs"),
      )
      .select(
        groupCols.map(col) ++ Seq(col("n_docs")) ++
          percentiles.zipWithIndex.map { case (p, i) =>
            element_at(col("__qs"), i + 1).as(s"p${(p * 100).round}")
          }: _*
      )
  }

  /** Adaptive per-group token-length quantiles — the panel face a
    * pipeline should call. One cheap count aggregation (map-side
    * combinable longs, negligible next to the percentile pass)
    * decides the engine: if every group fits `exactMaxGroupRows`, the
    * EXACT `percentile` runs ((n−1)·p linear interpolation —
    * `quantile_cont` semantics, hash-matching any SQL oracle);
    * otherwise the whole panel switches to [[tokenQuantilesApprox]]'s
    * bounded-state Greenwald-Khanna sketch (rank error ≤
    * 1/`accuracy`). The exact aggregate buffers a whole group's
    * values in one task — O(largest group) memory, an executor OOM
    * waiting for the biggest source on an open-domain corpus — which
    * is why the bound is enforced here rather than documented away.
    * The switch is per-call, not per-group, so one panel never mixes
    * quantile definitions.
    */
  def tokenQuantiles(
      df: DataFrame,
      textCol: String,
      groupCols: Seq[String],
      percentiles: Seq[Double] = Seq(0.5, 0.95, 0.99),
      exactMaxGroupRows: Long = 10000000L,
      accuracy: Int = 10000,
  ): DataFrame = {
    val maxGroup = df
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(max(col("__n")).as("__mx"))
      .head()
    val largest = if (maxGroup.isNullAt(0)) 0L else maxGroup.getLong(0)
    if (largest <= exactMaxGroupRows) {
      val pList = percentiles.map(p => s"${p}D").mkString("array(", ", ", ")")
      df.select(groupCols.map(col) :+ tokenCount(col(textCol)).cast("double").as("__n"): _*)
        .groupBy(groupCols.map(col): _*)
        .agg(
          count(lit(1)).as("n_docs"),
          expr(s"percentile(__n, $pList)").as("__qs"),
        )
        .select(
          groupCols.map(col) ++ Seq(col("n_docs")) ++
            percentiles.zipWithIndex.map { case (p, i) =>
              element_at(col("__qs"), i + 1).as(s"p${(p * 100).round}")
            }: _*
        )
    } else tokenQuantilesApprox(df, textCol, groupCols, percentiles, accuracy)
  }

  // ------------------------------------------- cross-document n-grams

  /** Distinct textual word n-grams of a document as an array column —
    * lowercase `[^\p{L}\p{N}_]+` tokens, grams joined with single spaces; sub-n
    * token docs yield an EMPTY array (same contract as the dedup
    * shingle kernels and the q18 oracle's `range(1, len(w)-1)`).
    * Native codegen kernel, ONE tokenize pass per row — the
    * equivalent built-in-HOF formulation
    * (`array_distinct(transform(sequence…, i → concat_ws(slice(w…))))`)
    * re-evaluates the `w` token array once PER GRAM and higher-order
    * functions run interpreted: 10× slower in the q64 stage probe.
    * Exactly reproducible in any SQL engine with list comprehensions
    * (the q64 oracle recomputes it with DuckDB list functions).
    */
  def distinctWordNgrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    // The codegen kernel is null-safe (NULL in → NULL out); coalesce
    // preserves this operator's documented contract that NULL text,
    // like sub-n-token text, yields an EMPTY array.
    coalesce(graft.functions.TextSignatures.distinctNgrams(text, n), typedLit(Seq.empty[String]))
  }

  /** Corpus distinct-n diversity (Li et al. 2016's distinct-n,
    * corpus-scale): one row per requested n with the total n-gram
    * instance count, the distinct n-gram count, and their ratio —
    * the standard diversity diagnostic for generated or heavily
    * templated corpora (a low distinct-2/distinct-3 flags a corpus
    * that repeats itself even when no single document does).
    * Tokenization matches the shared Unicode word convention, so the
    * whole output oracle-checks (q115).
    *
    * Scale shape: ONE corpus scan for every requested n — each row
    * tokenizes once and emits its (n, gram) pairs for all `ns` in a
    * single explode, then one grouped aggregate keyed by n (`total`
    * partial-aggregates map-side; exact `distinct` is the standard
    * expand-distinct plan whose shuffle is the distinct gram set, not
    * the token stream). The earlier one-pipeline-per-n formulation
    * re-scanned and re-tokenized the corpus |ns| times for the same
    * answer — 3× the scan cost at 100 TB for `ns = 1,2,3`. `ns` is a
    * handful of small integers by design (1..4).
    */
  def distinctNgramStats(
      df: DataFrame,
      textCol: String,
      ns: Seq[Int] = Seq(1, 2, 3),
  ): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), s"ns must be >= 1: $ns")
    val sorted = ns.distinct.sorted
    val toks = df.select(
      filter(split(lower(col(textCol)), TextHash.WordSplitRe), t => t =!= lit(""))
        .as("toks"))
    val pairTpe = "array<struct<n:int,gram:string>>"
    val perN = sorted.map { n =>
      when(size(col("toks")) >= n,
        transform(
          sequence(lit(0), size(col("toks")) - n),
          i => struct(
            lit(n).as("n"),
            array_join(slice(col("toks"), i + 1, lit(n)), " ").as("gram"))))
        .otherwise(expr(s"CAST(array() AS $pairTpe)"))
    }
    // an n no document reaches emits no pairs — its group never forms
    // (matches a GROUP BY replay, and avoids a 0/0 ratio)
    toks
      .select(explode(flatten(array(perN: _*))).as("p"))
      .groupBy(col("p.n").as("n"))
      .agg(
        count(lit(1)).as("total_ngrams"),
        countDistinct(col("p.gram")).as("distinct_ngrams"))
      .select(
        col("n"),
        col("total_ngrams"),
        col("distinct_ngrams"),
        (col("distinct_ngrams").cast("double") / col("total_ngrams")).as("distinct_ratio"))
      .orderBy("n")
  }

  /** Cross-document n-gram commonality — the boilerplate-contamination
    * signal (RefinedWeb/Dolma-style): for each document, how many of
    * its distinct n-grams also occur in at least `minDf` documents
    * corpus-wide, and the document frequency of its most widely shared
    * n-gram. High `common_frac` flags template/boilerplate text that
    * within-document repetition stats ([[withNgramRepetition]]) cannot
    * see.
    *
    * Scale shape: ONE corpus scan — explode distinct (doc, gram)
    * pairs, take the per-gram document frequency as a whole-partition
    * window count over the gram key (grams are distinct per doc, so
    * count-per-gram IS the df), then one aggregation keyed by doc.
    * The earlier aggregate+join formulation shuffled the same gram
    * stream for the join AND re-scanned/re-exploded the corpus for
    * the aggregate side — the window pays the identical by-gram
    * exchange with the second corpus scan gone. All counts exact —
    * the whole output oracle-checks.
    *
    * SKEW trade-off: the window shape buffers each gram's partition
    * rows (WindowExec's spillable row array) with NO map-side partial
    * aggregation — fine up to spill, but a truly ubiquitous
    * boilerplate gram (df in the hundreds of millions, the exact
    * signal this audit hunts) concentrates into one sorted, spilled
    * mega-partition. `skewSafe = true` buys back map-side combine by
    * paying a second corpus scan: aggregate the per-gram df first
    * (partial_count absorbs the hot gram on every mapper), then join
    * it back — the SortMergeJoin's buffered side is the ONE df row
    * per gram, so the hot gram streams instead of buffering. Flip it
    * when the corpus is boilerplate-heavy; results are identical.
    */
  def commonNgramStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      minDf: Long = 2L,
      skewSafe: Boolean = false,
  ): DataFrame = {
    val grams = df
      .select(col(idCol).as("doc_id"), explode(distinctWordNgrams(col(textCol), n)).as("gram"))
    // grams are distinct per doc, so count(*) per gram IS the document frequency
    val withDf =
      if (skewSafe) {
        val dfs = grams.groupBy("gram").agg(count(lit(1)).as("gram_df"))
        grams.join(dfs, "gram")
      } else {
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("gram"))
        grams.withColumn("gram_df", count(lit(1)).over(w))
      }
    withDf
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("gram_df") >= minDf, 1L).otherwise(0L)).as("n_common"),
        max(col("gram_df")).as("max_gram_df"),
      )
      .withColumn("common_frac", col("n_common").cast("double") / col("n_grams"))
  }

  /** CMS face of [[commonNgramStats]] — the gram-keyed shuffle+join
    * eliminated for the 100 TB path. Pass 1 builds a Count-Min sketch
    * of gram DOCUMENT frequencies (each doc contributes its distinct
    * grams once; grids are per-partition and treeReduce-merged —
    * grams never shuffle, [[Sketches.countMinSketch]]). Pass 2
    * re-derives each doc's distinct grams and probes the broadcast
    * grid — no join, no second shuffle.
    *
    * Error contract (one-sided, deterministic): CMS never
    * undercounts, so `n_common_est ≥ n_common` and
    * `max_gram_df_est ≥ max_gram_df` are INVARIANTS — boilerplate
    * detection errs toward flagging, never toward missing. A gram
    * overcounts only when it collides in ALL `depth` rows
    * (≈ load^depth); size `width` ≳ 4× distinct grams for ≲1e-4
    * per-gram overcount odds at depth 4. Output mirrors the exact
    * face with `_est` suffixes.
    */
  def commonNgramStatsApprox(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      minDf: Long = 2L,
      depth: Int = 4,
      width: Int = 1 << 18,
      seed: Long = 42L,
  ): DataFrame = {
    val grams = df
      .select(col(idCol).as("doc_id"), explode(distinctWordNgrams(col(textCol), n)).as("gram"))
    val cms = graft.operators.Sketches.countMinSketch(grams, "gram", depth, width, seed)
    val bc = df.sparkSession.sparkContext.broadcast(cms)
    val scoreUdf = udf { (gs: Seq[String]) =>
      val m = bc.value
      var common = 0L
      var mx = 0L
      if (gs != null) gs.foreach { g =>
        val e = m.estimate(g)
        if (e >= minDf) common += 1L
        if (e > mx) mx = e
      }
      (if (gs == null) 0L else gs.size.toLong, common, mx)
    }
    df.select(col(idCol).as("doc_id"), scoreUdf(distinctWordNgrams(col(textCol), n)).as("__s"))
      .select(
        col("doc_id"),
        col("__s._1").as("n_grams"),
        col("__s._2").as("n_common_est"),
        col("__s._3").as("max_gram_df_est"))
      .where(col("n_grams") > 0)
      .withColumn("common_frac_est", col("n_common_est").cast("double") / col("n_grams"))
  }

  /** HLL-register face of [[distinctNgramStats]] — the 100 TB scale
    * path. The exact face's `countDistinct` shuffles the FULL
    * distinct gram set (on a diverse corpus that is nearly the gram
    * stream itself, the SCALE.md caveat); this one ships `2^p` bytes
    * per n, total, ever: one mapPartitions pass tokenizes each
    * document ONCE, slides every window size over the same token
    * array (no per-n re-tokenize, no explode), updates one register
    * set per n, and treeReduce max-merges. `total_ngrams` stays
    * EXACT (integer sums commute); `distinct_ngrams` becomes the HLL
    * estimate (±1.04/√2^p ≈ 0.8% at the default p=14, the same
    * sketch contract as [[Sketches.hyperLogLog]] — identical
    * registers, so estimates are bit-stable under any partitioning).
    * Output schema matches the exact face with `_est` suffixes on
    * the approximate columns.
    */
  def distinctNgramStatsApprox(
      df: DataFrame,
      textCol: String,
      ns: Seq[Int] = Seq(1, 2, 3),
      p: Int = 14,
      seed: Long = 42L,
  ): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), s"ns must be >= 1: $ns")
    graft.operators.Sketches.Hll.checkP(p)
    val nsS = ns.distinct.sorted
    val spark = df.sparkSession
    val m = 1 << p
    val nN = nsS.size
    val rdd = df.select(col(textCol).cast("string")).rdd
    val merged: (Array[Long], Array[Array[Byte]]) =
      if (rdd.getNumPartitions == 0) (new Array[Long](nN), Array.fill(nN)(new Array[Byte](m)))
      else
        rdd
          .mapPartitions { it =>
            val totals = new Array[Long](nN)
            val regs = Array.fill(nN)(new Array[Byte](m))
            val sb = new java.lang.StringBuilder(64)
            it.foreach { row =>
              if (!row.isNullAt(0)) {
                val toks = graft.textutil.TextHash.tokenize(row.getString(0))
                var i = 0
                while (i < nN) {
                  val n = nsS(i)
                  var j = 0
                  val last = toks.length - n
                  while (j <= last) {
                    sb.setLength(0)
                    var k = 0
                    while (k < n) {
                      if (k > 0) sb.append(' ')
                      sb.append(toks(j + k))
                      k += 1
                    }
                    totals(i) += 1L
                    graft.operators.Sketches.Hll.update(regs(i), sb.toString, p, seed)
                    j += 1
                  }
                  i += 1
                }
              }
            }
            Iterator.single((totals, regs))
          }
          .treeReduce { (a, b) =>
            var i = 0
            while (i < nN) {
              a._1(i) += b._1(i)
              graft.operators.Sketches.Hll.maxMerge(a._2(i), b._2(i))
              i += 1
            }
            a
          }
    import spark.implicits._
    nsS.zipWithIndex
      .map { case (n, i) =>
        (n, merged._1(i), graft.operators.Sketches.Hll.estimate(merged._2(i)))
      }
      .filter(_._2 > 0L)
      .toDF("n", "total_ngrams", "distinct_ngrams_est")
      .withColumn(
        "distinct_ratio_est",
        col("distinct_ngrams_est").cast("double") / col("total_ngrams"))
      .orderBy("n")
  }

  // ------------------------------------------------------- readability

  final case class ReadabilityStats(
      n_words_rd: Long,
      n_sentences_rd: Long,
      n_syllables: Long,
      flesch_ease: Option[Double],
      fk_grade: Option[Double],
  )

  /** Flesch reading ease + Flesch-Kincaid grade level (Kincaid et
    * al. 1975) — the standard text-difficulty metrics a curriculum-
    * ordered training pipeline sorts or buckets by. Deterministic,
    * DuckDB-replayable conventions: words are the shared Unicode
    * tokenization ([[graft.textutil.TextHash.tokenize]]), sentences
    * are occurrences of `.` `!` `?` clamped to ≥ 1 (the C4 kernel's
    * sentence convention), and syllables per word are maximal runs of
    * `[aeiouy]` clamped to ≥ 1 per word — the classic vowel-group
    * heuristic (English-calibrated like the published formulas;
    * non-Latin words count 1 syllable each, so scores on non-English
    * text are defined but not meaningful). Zero-word text yields null
    * scores rather than a division artifact.
    */
  private[graft] def readabilityKernel(text: String): ReadabilityStats = {
    val t = if (text == null) "" else text
    readabilityFromToks(t, graft.textutil.TextHash.tokenize(t))
  }

  /** [[readabilityKernel]] body on a pre-tokenized doc — the shared
    * form [[withTextSignals]] fuses with the other token consumers so
    * one tokenize pass serves all of them. Order-independent over
    * `toks` (per-word syllable counts sum).
    */
  private def readabilityFromToks(t: String, toks: Array[String]): ReadabilityStats = {
    val nWords = toks.length.toLong
    var syl = 0L
    toks.foreach { w =>
      var cnt = 0
      var inRun = false
      var i = 0
      while (i < w.length) {
        val c = w.charAt(i)
        val v = c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'
        if (v && !inRun) cnt += 1
        inRun = v
        i += 1
      }
      syl += math.max(cnt, 1)
    }
    var sents = 0L
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (c == '.' || c == '!' || c == '?') sents += 1
      i += 1
    }
    val sentsCl = math.max(sents, 1L)
    if (nWords == 0L) ReadabilityStats(0L, sentsCl, 0L, None, None)
    else {
      // exact IEEE operation order mirrored by the oracle SQL:
      // ((c0 - c1*wps) - c2*spw) and ((c3*wps + c4*spw) - c5)
      val wps = nWords.toDouble / sentsCl
      val spw = syl.toDouble / nWords
      ReadabilityStats(nWords, sentsCl, syl,
        Some(206.835 - 1.015 * wps - 84.6 * spw),
        Some(0.39 * wps + 11.8 * spw - 15.59))
    }
  }

  /** Add `n_words_rd`, `n_sentences_rd`, `n_syllables`,
    * `flesch_ease`, `fk_grade` — pure per-row map, no shuffle.
    */
  def withReadability(df: DataFrame, textCol: String): DataFrame = {
    val u = udf { (t: String) => readabilityKernel(t) }
    val fields = Seq("n_words_rd", "n_sentences_rd", "n_syllables", "flesch_ease", "fk_grade")
    val flagged = df.withColumn("__rd", u(col(textCol)))
    fields.foldLeft(flagged)((d, f) => d.withColumn(f, col(s"__rd.$f"))).drop("__rd")
  }

  final case class UnigramEntropyStats(
      n_tokens_ue: Long,
      n_distinct_tokens: Long,
      unigram_entropy: Option[Double],
  )

  /** Word-level Shannon entropy of a document's unigram distribution —
    * the `rps_doc_unigram_entropy`-style information-density signal
    * (RedPajama-v2 quality annotations): near-zero for "buy now buy
    * now" spam that repetition RATIOS can miss when the repeated unit
    * is short, maximal (`ln n_tokens`) for all-distinct text. Computed
    * as `ln W − (Σ c·ln c)/W` over per-token counts `c` (W = total
    * tokens) — algebraically `−Σ p·ln p` but with one `ln` per DISTINCT
    * token instead of per occurrence. The Σ accumulates in sorted-token
    * order so the result is one fixed double per input, independent of
    * hash-map iteration or partitioning; consumers comparing against
    * another engine should still round (~4 decimals) — libm `ln` is
    * only 1-ulp-accurate and FP addition is order-sensitive, so
    * bit-parity across engines is not a contract. Tokenization is the
    * shared [[graft.textutil.TextHash.tokenize]] every oracle replays.
    * Zero-token text yields null entropy rather than a `0/0` artifact.
    */
  private[graft] def unigramEntropyKernel(text: String): UnigramEntropyStats =
    unigramEntropyFromToks(
      graft.textutil.TextHash.tokenize(if (text == null) "" else text),
      copyBeforeSort = false)

  /** [[unigramEntropyKernel]] body on a pre-tokenized doc. SORTS the
    * array in place unless `copyBeforeSort = true`. BOTH current
    * callers pass false: the standalone kernel owns its freshly
    * tokenized array, and the fused [[withTextSignals]] invokes this
    * as the LAST consumer of the shared token array (readability has
    * already run), so no order-sensitive consumer sees the sorted
    * array. If a future reorder puts a token consumer AFTER this call,
    * pass `copyBeforeSort = true` there — a sorted array silently
    * changes order-sensitive signals (e.g. repetition ratios).
    */
  private def unigramEntropyFromToks(
      toks0: Array[String], copyBeforeSort: Boolean): UnigramEntropyStats = {
    if (toks0.isEmpty) return UnigramEntropyStats(0L, 0L, None)
    val toks = if (copyBeforeSort) toks0.clone() else toks0
    java.util.Arrays.sort(toks.asInstanceOf[Array[AnyRef]])
    val w = toks.length
    var clnc = 0.0
    var distinct = 0L
    var i = 0
    while (i < w) {
      var j = i + 1
      while (j < w && toks(j) == toks(i)) j += 1
      val c = (j - i).toDouble
      clnc += c * math.log(c)
      distinct += 1
      i = j
    }
    UnigramEntropyStats(w.toLong, distinct, Some(math.log(w.toDouble) - clnc / w))
  }

  /** Add `n_tokens_ue`, `n_distinct_tokens`, `unigram_entropy` — pure
    * per-row map, no shuffle; at 100 TB this is scan-bound like every
    * other per-document signal.
    */
  def withUnigramEntropy(df: DataFrame, textCol: String): DataFrame = {
    val u = udf { (t: String) => unigramEntropyKernel(t) }
    val fields = Seq("n_tokens_ue", "n_distinct_tokens", "unigram_entropy")
    val flagged = df.withColumn("__ue", u(col(textCol)))
    fields.foldLeft(flagged)((d, f) => d.withColumn(f, col(s"__ue.$f"))).drop("__ue")
  }

  /** Feature-hashed text embedding kernel (the hashing trick with
    * sign hashing — Weinberger et al., ICML'09): each word n-gram of
    * order `ngramsMin..ngrams` (default: exactly `ngrams`) hashes to
    * a dimension (`mix64(fnv64(gram) ^ seed)`, bits 1..63 mod `dim`)
    * and a ±1 sign (bit 0), occurrence counts accumulate signed —
    * damped to `1 + ln(tf)` per distinct gram when `sublinearTf` (the
    * classic sublinear-TF retrieval weighting, so a 50×-repeated
    * boilerplate phrase counts ~5×, not 50×) — and the vector
    * L2-normalizes (`normalize = false` returns the RAW signed
    * accumulation, the [[hashEmbedIdf]] face's pre-weighting input).
    * Deterministic, model-free, and the estimator is unbiased for the
    * (damped) n-gram-count inner product — so the cosine of two
    * hashed embeddings tracks the n-gram overlap of the texts.
    * Null/empty/sub-n-token texts (and the measure-zero all-cancelled
    * accumulation) return null — the degenerate-vector convention
    * every ANN face's nonDegenerate guard drops.
    */
  private[graft] def hashEmbedKernel(
      text: String,
      dim: Int,
      ngrams: Int,
      seed: Long,
      ngramsMin: Int = 0,
      sublinearTf: Boolean = false,
      normalize: Boolean = true): Array[Float] = {
    if (text == null) return null
    val lo = if (ngramsMin <= 0) ngrams else ngramsMin
    val toks = graft.textutil.TextHash.tokenize(text)
    if (toks.length < lo) return null
    val acc = new Array[Double](dim)
    // the sublinear damp needs per-gram counts BEFORE folding into the
    // (much smaller) dim array, so that path buckets by the full
    // 64-bit gram hash first; the linear path accumulates directly.
    // LongMap iteration order is a pure function of the insertion
    // sequence, so the fold stays deterministic per text.
    val tf = if (sublinearTf) new scala.collection.mutable.LongMap[Int]() else null
    val sb = new java.lang.StringBuilder
    var n = lo
    while (n <= ngrams) {
      var i = 0
      while (i + n <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        val h = graft.textutil.TextHash.mix64(
          graft.textutil.TextHash.fnv64(sb.toString) ^ seed)
        if (sublinearTf) tf(h) = tf.getOrElse(h, 0) + 1
        else { // h >>> 1 is non-negative
          acc(((h >>> 1) % dim).toInt) += (if ((h & 1L) == 0L) 1.0 else -1.0)
        }
        i += 1
      }
      n += 1
    }
    if (sublinearTf) tf.foreach { case (h, c) =>
      val w = 1.0 + math.log(c.toDouble)
      acc(((h >>> 1) % dim).toInt) += (if ((h & 1L) == 0L) w else -w)
    }
    var norm2 = 0.0
    var k = 0
    while (k < dim) { norm2 += acc(k) * acc(k); k += 1 }
    if (norm2 == 0.0) return null
    val out = new Array[Float](dim)
    val inv = if (normalize) 1.0 / math.sqrt(norm2) else 1.0
    k = 0
    while (k < dim) { out(k) = (acc(k) * inv).toFloat; k += 1 }
    out
  }

  /** Add a deterministic, model-free `outCol` embedding per document
    * via [[hashEmbedKernel]] — the bridge from the TEXT pipeline to
    * the vector machinery ([[Similarity]], [[VectorStore]]) when no
    * learned encoder is in the loop: near-duplicate texts land at
    * cosine ≈ their n-gram overlap, so semantic-dedup/ANN recipes run
    * end-to-end on text alone (q167 gates exactly that composition).
    * `ngrams = 2` (default) makes cross-document similarity track
    * SHARED PHRASES rather than shared vocabulary — unigram hashing
    * scores two unrelated documents of similar word stock high; set
    * `ngramsMin < ngrams` to MIX orders (e.g. 1..2 blends vocabulary
    * and phrase overlap — the classic retrieval recipe when texts are
    * too short for pure bigrams to overlap at all). `sublinearTf`
    * damps each distinct gram to `1 + ln(tf)` so a repeated phrase
    * cannot dominate the vector by count alone.
    * Pure per-row map, scan-bound; `dim` floats per row downstream.
    * Corpus-level term weighting (the other classic upgrade) is the
    * two-pass [[hashEmbedIdf]] face.
    */
  def hashEmbed(
      df: DataFrame,
      textCol: String,
      outCol: String = "embedding",
      dim: Int = 256,
      ngrams: Int = 2,
      seed: Long = 42L,
      ngramsMin: Int = 0,
      sublinearTf: Boolean = false,
  ): DataFrame = {
    require(dim > 0, s"hashEmbed: dim must be positive, got $dim")
    require(ngrams >= 1, s"hashEmbed: ngrams must be >= 1, got $ngrams")
    require(ngramsMin <= ngrams,
      s"hashEmbed: ngramsMin must be <= ngrams, got $ngramsMin > $ngrams")
    val u = udf { (t: String) =>
      hashEmbedKernel(t, dim, ngrams, seed, ngramsMin, sublinearTf)
    }
    df.withColumn(outCol, u(col(textCol)))
  }

  /** [[hashEmbed]] with CORPUS-LEVEL inverse-document-frequency
    * weighting, computed in the HASHED space (per-dimension IDF over
    * the `dim` hash buckets, not per-gram — the aggregation state is
    * `dim + 1` longs regardless of corpus size, so the weighting
    * costs one treeAggregate pass and a broadcast of `dim` doubles
    * at ANY scale): dimension j of the raw signed-count vector is
    * scaled by `ln(N / df_j)` (df_j = documents with a nonzero count
    * in bucket j; never-seen buckets weight 0) and the result
    * L2-normalizes. A gram every document carries — shared
    * boilerplate, the navigation chrome of a crawled site — lands in
    * buckets with df_j = N and weights to EXACTLY zero, so document
    * similarity is driven by each document's distinctive content; the
    * unweighted face scores two documents that share only boilerplate
    * as near-duplicates (q172 gates exactly that separation).
    * Classic TF-IDF (Salton & Buckley '88) composed with the hashing
    * trick (Weinberger et al., ICML'09); `sublinearTf` adds the
    * `1 + ln(tf)` damp on the TF side.
    *
    * Two passes over the input by construction (IDF is a corpus
    * statistic): the raw projection lands ONCE (`materialize` — the
    * repo-wide stage-boundary contract; ParquetDir on preemptible
    * executors), the DF aggregate and the weighting both read the
    * landed blocks. Rows whose weighted vector is all-zero (documents
    * containing ONLY corpus-universal grams) return null, like every
    * other degenerate embedding.
    *
    * The statistics REFIT on every call — right for one-shot corpus
    * analysis, wrong across batches that must share an embedding space
    * (a persisted [[VectorStore]], a streaming query side): there, fit
    * once with [[fitHashIdf]] and embed every batch with the frozen
    * [[applyHashIdf]] face (bit-identical to this one on the fit
    * corpus; q175 gates the drift the refit face suffers).
    */
  def hashEmbedIdf(
      df: DataFrame,
      textCol: String,
      outCol: String = "embedding",
      dim: Int = 256,
      ngrams: Int = 2,
      seed: Long = 42L,
      ngramsMin: Int = 0,
      sublinearTf: Boolean = false,
      materialize: Materialize = Materialize.LocalCheckpoint,
  ): DataFrame = {
    require(dim > 0, s"hashEmbedIdf: dim must be positive, got $dim")
    require(ngrams >= 1, s"hashEmbedIdf: ngrams must be >= 1, got $ngrams")
    require(ngramsMin <= ngrams,
      s"hashEmbedIdf: ngramsMin must be <= ngrams, got $ngramsMin > $ngrams")
    require(materialize != Materialize.Lazy,
      "hashEmbedIdf: Materialize.Lazy would re-execute the raw hashing pass for " +
        "the DF aggregate AND the weighting — pass LocalCheckpoint or ParquetDir")
    val rawU = udf { (t: String) =>
      hashEmbedKernel(t, dim, ngrams, seed, ngramsMin, sublinearTf,
        normalize = false)
    }
    val landed = Materialize(df.withColumn(outCol, rawU(col(textCol))), materialize)
    val agg = dfAggregate(landed, outCol, dim)
    val model = HashIdfModel(dim, ngrams, seed, ngramsMin, sublinearTf,
      nDocs = agg(dim), df = agg.take(dim))
    val bcIdf = df.sparkSession.sparkContext.broadcast(model.idf)
    val weightU = udf { (v: Array[Float]) =>
      if (v == null) null else idfWeightKernel(v, bcIdf.value, dim)
    }
    landed.withColumn(outCol, weightU(col(outCol)))
  }

  /** Frozen corpus-level term statistics for the [[hashEmbed]] hashed
    * space — the FIT-ONCE / APPLY-EVERYWHERE form of [[hashEmbedIdf]],
    * which refits its statistics from whatever corpus each call sees.
    * That refit is the right default for one-shot corpus analysis and
    * WRONG for anything persisted: a vector store built from batch-1
    * embeddings serves batch-2 queries embedded with batch-2's
    * statistics, so the same text embeds differently as the batch
    * composition shifts and store-side cosines silently drift (q175
    * plants exactly that failure: the refit face un-hits a stored
    * document's own text). Freezing the statistics makes the embedding
    * a pure function of the text again — and therefore stateless,
    * which is what lets [[applyHashIdf]] run inside a Structured
    * Streaming plan where a two-pass corpus aggregate cannot.
    *
    * State is `dim` per-bucket document frequencies plus the corpus
    * size — `dim + 1` longs at ANY corpus scale, the same bounded
    * shape the in-line face aggregates. `df(j)` counts documents whose
    * RAW signed accumulation is nonzero in bucket j (a bucket whose
    * signs cancel within a document does not count that document);
    * weights are `ln(nDocs / df_j)`, never-seen buckets weight exactly
    * 0 — identical conventions to [[hashEmbedIdf]], locked by the
    * fit⇄inline parity spec. Persistence via
    * [[IndexStore.saveHashIdf]] / [[IndexStore.loadHashIdf]] is
    * bit-exact (plain parquet, the [[IndexStore]] contract).
    */
  final case class HashIdfModel(
      dim: Int,
      ngrams: Int,
      seed: Long,
      ngramsMin: Int,
      sublinearTf: Boolean,
      nDocs: Long,
      df: Array[Long]) {
    require(df.length == dim,
      s"HashIdfModel: df length ${df.length} != dim $dim")

    /** Per-dimension weights `ln(nDocs / df_j)`; never-seen buckets
      * (df 0) weight exactly 0, corpus-universal buckets (df = nDocs)
      * likewise (ln 1). Recomputed per call — callers broadcast once.
      */
    def idf: Array[Double] = {
      val n = math.max(nDocs, 1L).toDouble
      val out = new Array[Double](dim)
      var j = 0
      while (j < dim) {
        out(j) = if (df(j) == 0L) 0.0 else math.log(n / df(j))
        j += 1
      }
      out
    }

    /** Combine statistics fit on DISJOINT document sets — df counts
      * and corpus sizes add, so `fit(a) merged fit(b)` equals
      * `fit(a ∪ b)` exactly (spec-locked). The incremental-epoch form:
      * fit each ingest batch, fold into the standing model — no pass
      * over the standing corpus. Hash parameters must match; mixing
      * spaces is a hard error, not a silent re-weighting.
      *
      * RE-FREEZING IS AN EPOCH EVENT, not a rolling update: vectors
      * embedded under the old statistics live in a different weighted
      * space, so adopting a merged model means re-embedding the
      * standing corpus into a NEW store epoch (the
      * [[VectorStore.merge]]/compaction machinery exists for exactly
      * this) — the same posture as an OPQ rotation retrain. Between
      * refreezes, keep serving the frozen model; its weights only go
      * stale as fast as corpus-level term frequencies drift.
      */
    def merged(other: HashIdfModel): HashIdfModel = {
      require(dim == other.dim && ngrams == other.ngrams &&
        seed == other.seed && ngramsMin == other.ngramsMin &&
        sublinearTf == other.sublinearTf,
        "HashIdfModel.merged: models were fit with different hashing " +
          s"parameters — ($dim,$ngrams,$seed,$ngramsMin,$sublinearTf) vs " +
          s"(${other.dim},${other.ngrams},${other.seed},${other.ngramsMin}," +
          s"${other.sublinearTf})")
      val d = new Array[Long](dim)
      var j = 0
      while (j < dim) { d(j) = df(j) + other.df(j); j += 1 }
      copy(nDocs = nDocs + other.nDocs, df = d)
    }
  }

  /** The one distributed pass behind every IDF fit: slot j < dim is
    * df_j over the raw signed-count vectors in `vecCol`, slot dim is
    * the non-null document count — treeAggregate clones the zero per
    * task, state is `dim + 1` longs regardless of corpus size.
    */
  private def dfAggregate(vecs: DataFrame, vecCol: String, dim: Int): Array[Long] =
    vecs.select(col(vecCol)).where(col(vecCol).isNotNull)
      .rdd.treeAggregate(new Array[Long](dim + 1))(
        (acc, row) => {
          // executor-side indexed loop → primitive array first (the
          // repo-wide convention; getSeq yields a boxed ArraySeq)
          val v = row.getSeq[Float](0).toArray
          var j = 0
          while (j < dim) { if (v(j) != 0f) acc(j) += 1L; j += 1 }
          acc(dim) += 1L
          acc
        },
        (a, b) => {
          var j = 0
          while (j <= dim) { a(j) += b(j); j += 1 }
          a
        })

  /** Weight a RAW signed-count vector by per-dimension IDF and
    * L2-normalize; all-zero weighted vectors (documents of ONLY
    * corpus-universal or never-seen grams) return null — the shared
    * degenerate convention. The single weighting implementation behind
    * [[hashEmbedIdf]] and [[applyHashIdf]], so fit-then-apply is
    * bit-identical to the in-line face by construction.
    */
  private def idfWeightKernel(
      v: Array[Float],
      w: Array[Double],
      dim: Int): Array[Float] = {
    val tmp = new Array[Double](dim)
    var norm2 = 0.0
    var k = 0
    while (k < dim) {
      tmp(k) = v(k) * w(k)
      norm2 += tmp(k) * tmp(k)
      k += 1
    }
    if (norm2 == 0.0) null
    else {
      val inv = 1.0 / math.sqrt(norm2)
      val out = new Array[Float](dim)
      k = 0
      while (k < dim) { out(k) = (tmp(k) * inv).toFloat; k += 1 }
      out
    }
  }

  /** Fit a [[HashIdfModel]] over `textCol` in ONE distributed pass
    * (raw-hash each document and fold nonzero-bucket flags into the
    * `dim + 1`-long aggregate — no landing, because unlike
    * [[hashEmbedIdf]] nothing downstream re-reads the raw vectors).
    * Null / sub-n-token documents don't count, matching the in-line
    * face. The returned model is driver-sized (`dim` longs) at any
    * corpus scale.
    */
  def fitHashIdf(
      df: DataFrame,
      textCol: String,
      dim: Int = 256,
      ngrams: Int = 2,
      seed: Long = 42L,
      ngramsMin: Int = 0,
      sublinearTf: Boolean = false,
  ): HashIdfModel = {
    require(dim > 0, s"fitHashIdf: dim must be positive, got $dim")
    require(ngrams >= 1, s"fitHashIdf: ngrams must be >= 1, got $ngrams")
    require(ngramsMin <= ngrams,
      s"fitHashIdf: ngramsMin must be <= ngrams, got $ngramsMin > $ngrams")
    val rawU = udf { (t: String) =>
      hashEmbedKernel(t, dim, ngrams, seed, ngramsMin, sublinearTf,
        normalize = false)
    }
    val agg = dfAggregate(df.select(rawU(col(textCol)).as("__raw")), "__raw", dim)
    HashIdfModel(dim, ngrams, seed, ngramsMin, sublinearTf,
      nDocs = agg(dim), df = agg.take(dim))
  }

  /** Embed `textCol` with a FROZEN [[HashIdfModel]] — hash, weight,
    * and normalize fused into one per-row pass (the fit's two-pass
    * structure collapses once the statistics are frozen), so the face
    * is scan-bound, needs no materialization, and runs unchanged
    * inside a Structured Streaming plan (stateless — the stream≡batch
    * parity spec locks it). On the model's OWN fit corpus the output
    * is bit-identical to [[hashEmbedIdf]]; on any other batch it is
    * the CONSISTENT embedding the refitting face cannot give (q175).
    * The `dim`-double weight vector broadcasts once per plan.
    */
  def applyHashIdf(
      df: DataFrame,
      textCol: String,
      model: HashIdfModel,
      outCol: String = "embedding",
  ): DataFrame = {
    val bcIdf = df.sparkSession.sparkContext.broadcast(model.idf)
    val dim = model.dim
    val ngrams = model.ngrams
    val seed = model.seed
    val ngramsMin = model.ngramsMin
    val sublinearTf = model.sublinearTf
    val u = udf { (t: String) =>
      val raw = hashEmbedKernel(t, dim, ngrams, seed, ngramsMin, sublinearTf,
        normalize = false)
      if (raw == null) null else idfWeightKernel(raw, bcIdf.value, dim)
    }
    df.withColumn(outCol, u(col(textCol)))
  }

  final case class TextSignals(
      n_words_rd: Long,
      n_sentences_rd: Long,
      n_syllables: Long,
      flesch_ease: Option[Double],
      fk_grade: Option[Double],
      n_tokens_ue: Long,
      n_distinct_tokens: Long,
      unigram_entropy: Option[Double],
      n_lines_ls: Long,
      max_line_len: Long,
      sum_line_len: Long,
      avg_line_len: Double,
      n_alnum_cp: Long,
      n_cp: Long,
      frac_alnum: Option[Double],
      raw_len: Long,
      deflate_len: Long,
      compression_ratio: Option[Double],
  )

  /** The FUSED per-document annotation pass — readability, unigram
    * entropy, line-shape, and compressibility in ONE scalar UDF with
    * ONE tokenize pass, for the RPv2-style "annotate everything, let
    * consumers threshold later" pipelines where the signal sweep IS
    * the scan cost at 100 TB. Column-for-column identical to chaining
    * [[withReadability]] → [[withUnigramEntropy]] →
    * [[graft.operators.QualityFilters.withLineSignals]] →
    * [[graft.operators.QualityFilters.withCompressibility]] (the same
    * kernels run on the same inputs — entropy sorts a COPY of the
    * shared token array), but tokenizes once instead of twice and
    * crosses the UDF boundary once instead of four times. Set
    * `deflateLevel = -1` to skip the deflate pass — the one
    * non-linear-cost signal in the bundle — when compressibility
    * isn't wanted: `raw_len` (UTF-8 bytes, deflate-independent) stays
    * real; `deflate_len` reads 0 and `compression_ratio` null.
    */
  def withTextSignals(
      df: DataFrame, textCol: String, deflateLevel: Int = 6): DataFrame = {
    require(deflateLevel >= -1 && deflateLevel <= 9,
      s"deflate level must be in [0,9], or -1 to skip: $deflateLevel")
    val u = udf { (text: String) =>
      val t = if (text == null) "" else text
      val toks = graft.textutil.TextHash.tokenize(t)
      val rd = readabilityFromToks(t, toks)
      // entropy is the LAST token consumer (readability already ran;
      // the remaining kernels take the raw string), so the in-place
      // sort needs no defensive copy — one less per-row allocation
      // in the pass whose point is being the cheap sweep
      val ue = unigramEntropyFromToks(toks, copyBeforeSort = false)
      val ls = QualityFilters.lineSignalsKernel(t)
      val cz =
        if (deflateLevel < 0)
          QualityFilters.CompressibilityStats(
            t.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong, 0L, None)
        else QualityFilters.compressibilityKernel(t, deflateLevel)
      TextSignals(
        rd.n_words_rd, rd.n_sentences_rd, rd.n_syllables, rd.flesch_ease, rd.fk_grade,
        ue.n_tokens_ue, ue.n_distinct_tokens, ue.unigram_entropy,
        ls.n_lines_ls, ls.max_line_len, ls.sum_line_len, ls.avg_line_len,
        ls.n_alnum_cp, ls.n_cp, ls.frac_alnum,
        cz.raw_len, cz.deflate_len, cz.compression_ratio)
    }
    val fields = Seq(
      "n_words_rd", "n_sentences_rd", "n_syllables", "flesch_ease", "fk_grade",
      "n_tokens_ue", "n_distinct_tokens", "unigram_entropy",
      "n_lines_ls", "max_line_len", "sum_line_len", "avg_line_len",
      "n_alnum_cp", "n_cp", "frac_alnum",
      "raw_len", "deflate_len", "compression_ratio")
    val flagged = df.withColumn("__sig", u(col(textCol)))
    fields.foldLeft(flagged)((d, f) => d.withColumn(f, col(s"__sig.$f"))).drop("__sig")
  }
}
