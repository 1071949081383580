package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-ingest text primitives — the stage BEFORE every other curation
  * operator when the corpus arrives as crawled HTML: extract the
  * visible text, and normalize URLs so per-domain caps, dedup keys,
  * and blocklist filters see one spelling per resource.
  *
  * Both are pure per-row maps (no shuffle, no state, stream as-is);
  * at 100 TB they run at scan speed inside whatever projection
  * already touches the payload.
  *
  * The HTML walker is a character scanner, not a regex: quoted `>`
  * inside attributes, unterminated tags, and `<script>` bodies with
  * markup in string literals are all handled by state, and the cost
  * stays strictly linear in the input (no regex backtracking cliffs
  * on adversarial crawl bytes).
  */
object WebText {

  private val namedEntities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "copy" -> "©", "reg" -> "®",
    "mdash" -> "—", "ndash" -> "–", "hellip" -> "…",
  )

  /** Tags whose boundaries break lines in the extracted text. */
  private val blockTags = Set(
    "p", "div", "br", "li", "ul", "ol", "tr", "td", "th", "table",
    "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre", "section",
    "article", "header", "footer", "form", "hr",
  )

  /** Tags whose entire CONTENT is invisible (dropped, not unwrapped). */
  private val rawTextTags = Set("script", "style", "noscript", "template")

  /** Decode `&name;`, `&#NN;`, `&#xHH;`. Unknown or malformed
    * entities pass through literally (crawl data is full of bare
    * ampersands — eating them would corrupt text).
    */
  private[graft] def decodeEntities(s: String): String =
    decodeEntities(s, sanitizeSentinels = false, sanitizeParaBreak = false)

  /** `sanitizeSentinels` is the link-density pass's guard: a numeric
    * reference like `&#1;`/`&#2;` would otherwise DECODE INTO the
    * anchor sentinel chars and forge link state (flipping `inLink`
    * with no real tag), so decoded output — and only decoded output,
    * never the pass-through chars carrying the REAL sentinels — maps
    * those two code points to a space. `sanitizeParaBreak` is the
    * same guard for the paragraph-boundary sentinel (`&#3;` must not
    * forge a paragraph break in the blank-line-preserving mode).
    */
  private def decodeEntities(
      s: String, sanitizeSentinels: Boolean, sanitizeParaBreak: Boolean): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val body = if (semi > i && semi - i <= 10) s.substring(i + 1, semi) else null
        val decoded =
          if (body == null) null
          else if (body.startsWith("#x") || body.startsWith("#X"))
            try Character.toChars(Integer.parseInt(body.substring(2), 16)).mkString
            catch { case _: Exception => null }
          else if (body.startsWith("#"))
            try Character.toChars(Integer.parseInt(body.substring(1))).mkString
            catch { case _: Exception => null }
          else namedEntities.get(body.toLowerCase).orNull
        if (decoded != null) {
          if (sanitizeSentinels || sanitizeParaBreak)
            out.append(decoded.map(ch =>
              if ((sanitizeSentinels && (ch == LinkOpen || ch == LinkClose)) ||
                (sanitizeParaBreak && ch == ParaBreak)) ' '
              else ch))
          else out.append(decoded)
          i = semi + 1
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Anchor-text sentinels for the link-density pass: the scanner
    * wraps `<a>…</a>` content in these private-use control chars so
    * the density computation survives the downstream entity decode
    * and line split without a second parse. Stripped before output.
    */
  private val LinkOpen = '\u0001'
  private val LinkClose = '\u0002'

  /** Paragraph-boundary sentinel for the blank-line-preserving mode:
    * non-`br` block tags emit this instead of `\n` so the kernels can
    * rebuild `\n\n` paragraph breaks AFTER per-line whitespace
    * normalization (which would otherwise collapse blank lines away).
    * Like the link sentinels it is scrubbed from content — both the
    * literal code point and an entity-decoded `&#3;` — so crawl bytes
    * cannot forge a paragraph boundary.
    */
  private val ParaBreak = '\u0003'

  /** The raw scan shared by [[htmlToTextKernel]] and
    * [[htmlToMainTextKernel]]: visible chars with `\n` at block-tag
    * boundaries, script/style/comment content dropped, entities NOT
    * yet decoded. `markLinks` additionally wraps anchor content in
    * [[LinkOpen]]/[[LinkClose]]. `paragraphBreaks` emits [[ParaBreak]]
    * at every block boundary EXCEPT `br` (a line break within a
    * paragraph, not a new block — the one tag whose meaning IS the
    * single newline).
    */
  private def scanRaw(html: String, markLinks: Boolean, paragraphBreaks: Boolean): String = {
    val raw = new java.lang.StringBuilder(html.length)
    var i = 0
    val n = html.length
    var rawUntilTag: String = null // inside <script>/<style>/... body
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (rawUntilTag != null && !html.regionMatches(i, "</", 0, 2)) {
          // inside a raw-text element, a bare '<' (e.g. `if (a<b)` in
          // script) is CONTENT, not a tag — treating it as one would
          // swallow the real closing tag and drop the document's tail
          i += 1
        } else if (i + 1 < n && html.charAt(i + 1) == '?') {
          // processing instruction / XML prolog / leaked PHP: HTML5
          // treats '<?' as a bogus comment — skip to the next '>'
          val end = html.indexOf('>', i + 2)
          i = if (end < 0) n else end + 1
        } else if (i + 1 < n && {
          val c1 = html.charAt(i + 1)
          // HTML5's tag-open rule is ASCII alpha — '<é' is text
          !((c1 >= 'a' && c1 <= 'z') || (c1 >= 'A' && c1 <= 'Z') || c1 == '/' || c1 == '!')
        }) {
          // '<' not opening a tag ('a < b' in prose) is text
          raw.append(c)
          i += 1
        } else if (html.regionMatches(i, "<!--", 0, 4)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          // scan the tag with quote awareness
          var j = i + 1
          var quote = 0.toChar
          while (j < n && (quote != 0 || html.charAt(j) != '>')) {
            val cj = html.charAt(j)
            if (quote != 0) { if (cj == quote) quote = 0 }
            else if (cj == '"' || cj == '\'') quote = cj
            j += 1
          }
          val tagBody = html.substring(i + 1, math.min(j, n))
          val isClose = tagBody.startsWith("/")
          val name = tagBody.dropWhile(_ == '/').takeWhile(ch => ch.isLetterOrDigit).toLowerCase
          if (rawUntilTag != null) {
            if (isClose && name == rawUntilTag) rawUntilTag = null
            // anything else inside a raw-text element is content: skip
          } else {
            if (!isClose && rawTextTags.contains(name)) rawUntilTag = name
            if (blockTags.contains(name))
              raw.append(if (paragraphBreaks && name != "br") ParaBreak else '\n')
            if (markLinks && name == "a")
              raw.append(if (isClose) LinkClose else LinkOpen)
          }
          i = if (j >= n) n else j + 1
        }
      } else {
        // source newlines are soft whitespace — only BLOCK TAGS break
        // lines in the extracted text. When marking links, literal
        // U+0001/U+0002 in CONTENT would forge the anchor sentinels —
        // map them to spaces (they are never meaningful text)
        if (rawUntilTag == null)
          raw.append(
            if (c == '\n' || c == '\r') ' '
            else if (markLinks && (c == LinkOpen || c == LinkClose)) ' '
            else if (paragraphBreaks && c == ParaBreak) ' '
            else c)
        i += 1
      }
    }
    raw.toString
  }

  /** Extract visible text from HTML: drop script/style/noscript
    * content and comments, break lines at block-tag boundaries,
    * decode entities, collapse whitespace runs, trim lines, drop
    * empty lines. NULL-safe (null → null).
    */
  private[graft] def htmlToTextKernel(html: String): String =
    htmlToTextKernel(html, paragraphBreaks = false)

  /** `paragraphBreaks = true` is the blank-line-preserving mode: block
    * boundaries other than `br` become `\n\n` in the output (empty
    * blocks collapse — never more than one blank line), `br` stays a
    * single `\n`, so [[graft.operators.Dedup.paragraphDedup]]'s
    * `\n{2,}` units see real HTML block structure instead of one
    * degenerate whole-document unit. Default off: byte-stable output
    * for existing callers.
    */
  private[graft] def htmlToTextKernel(html: String, paragraphBreaks: Boolean): String = {
    if (html == null) return null
    // entity decode, then per-line whitespace normalization
    val decoded = decodeEntities(
      scanRaw(html, markLinks = false, paragraphBreaks),
      sanitizeSentinels = false, sanitizeParaBreak = paragraphBreaks)
    if (!paragraphBreaks)
      decoded
        .split('\n')
        .iterator
        .map(_.split("\\s+").filter(_.nonEmpty).mkString(" "))
        .filter(_.nonEmpty)
        .mkString("\n")
    else
      decoded
        .split(ParaBreak)
        .iterator
        .map(_.split('\n')
          .iterator
          .map(_.split("\\s+").filter(_.nonEmpty).mkString(" "))
          .filter(_.nonEmpty)
          .mkString("\n"))
        .filter(_.nonEmpty)
        .mkString("\n\n")
  }

  /** MAIN-CONTENT extraction ([[htmlToTextKernel]] plus the classic
    * link-density boilerplate rule of jusText/Readability): lines
    * whose non-whitespace characters are mostly anchor text —
    * navigation bars, footer link rows, tag clouds, "related posts"
    * blocks — are dropped; everything else comes through exactly as
    * [[htmlToTextKernel]] emits it (inline links KEEP their anchor
    * text — a prose line citing one link is content, not chrome).
    *
    * `maxLinkDensity` is the kept-line ceiling on
    * linkChars/totalChars (non-whitespace, counted after entity
    * decode); the published heuristics use 0.5-ish. Anchor state
    * carries across block-tag line breaks (a link spanning a `<br>`
    * still counts on both lines). Like the base scanner this is one
    * linear pass — no DOM, no regex — and a pure per-row map at any
    * scale.
    */
  private[graft] def htmlToMainTextKernel(html: String, maxLinkDensity: Double): String =
    htmlToMainTextKernel(html, maxLinkDensity, paragraphBreaks = false)

  /** `paragraphBreaks` — the same blank-line-preserving mode as
    * [[htmlToTextKernel]]'s: kept lines within one block join with
    * `\n`, blocks join with `\n\n`, and a block all of whose lines
    * fail the density rule disappears whole (no empty paragraph is
    * left behind). Anchor state still carries across both line AND
    * paragraph boundaries — a link spanning block tags counts on
    * every line it covers.
    */
  private[graft] def htmlToMainTextKernel(
      html: String, maxLinkDensity: Double, paragraphBreaks: Boolean): String = {
    if (html == null) return null
    // sanitized decode: &#1;/&#2;/&#3; references must not forge sentinels
    val decoded = decodeEntities(
      scanRaw(html, markLinks = true, paragraphBreaks),
      sanitizeSentinels = true, sanitizeParaBreak = paragraphBreaks)
    var inLink = false
    // kept lines of one paragraph (the whole document when
    // paragraphBreaks is off), joined with '\n'
    def keptLines(para: String): String = {
      val out = new java.lang.StringBuilder(para.length)
      var first = true
      para.split('\n').foreach { line =>
        val sb = new java.lang.StringBuilder(line.length)
        var total = 0
        var link = 0
        var i = 0
        while (i < line.length) {
          val c = line.charAt(i)
          if (c == LinkOpen) inLink = true
          else if (c == LinkClose) inLink = false
          else {
            if (!Character.isWhitespace(c)) { total += 1; if (inLink) link += 1 }
            sb.append(c)
          }
          i += 1
        }
        val norm = sb.toString.split("\\s+").filter(_.nonEmpty).mkString(" ")
        if (norm.nonEmpty && (total == 0 || link.toDouble / total <= maxLinkDensity)) {
          if (!first) out.append('\n')
          out.append(norm)
          first = false
        }
      }
      out.toString
    }
    if (!paragraphBreaks) keptLines(decoded)
    else decoded.split(ParaBreak).iterator.map(keptLines).filter(_.nonEmpty).mkString("\n\n")
  }

  /** Add `outCol` = link-density-filtered main content of an HTML
    * column (the boilerplate-stripping sibling of [[htmlToText]]).
    */
  def htmlToMainText(
      df: DataFrame,
      htmlCol: String,
      outCol: String = "text",
      maxLinkDensity: Double = 0.5,
      paragraphBreaks: Boolean = false,
  ): DataFrame = {
    require(maxLinkDensity >= 0 && maxLinkDensity <= 1,
      s"maxLinkDensity must be in [0,1]: $maxLinkDensity")
    val u = udf { (h: String) => htmlToMainTextKernel(h, maxLinkDensity, paragraphBreaks) }
    df.withColumn(outCol, u(col(htmlCol)))
  }

  /** Add `outCol` = extracted visible text of an HTML column.
    * `paragraphBreaks = true` preserves HTML block structure as blank
    * lines (`\n\n` between blocks, `\n` only for `br`) so paragraph-
    * granular dedup sees real units; default off is byte-stable with
    * the historical single-`\n` output.
    */
  def htmlToText(
      df: DataFrame,
      htmlCol: String,
      outCol: String = "text",
      paragraphBreaks: Boolean = false,
  ): DataFrame = {
    val u = udf { (h: String) => htmlToTextKernel(h, paragraphBreaks) }
    df.withColumn(outCol, u(col(htmlCol)))
  }

  /** Canonical URL spelling: lowercase scheme+host, strip default
    * ports (http:80 / https:443), strip the fragment, drop a bare
    * trailing "?", keep path case and query order (reordering query
    * params changes semantics on real endpoints — deliberately NOT
    * done). Unparseable input comes back unchanged: a filter can
    * quarantine it, a normalizer must not invent a spelling.
    */
  private[graft] def normalizeUrlKernel(url: String): String = {
    if (url == null) return null
    try {
      val schemeEnd = url.indexOf("://")
      if (schemeEnd <= 0) return url
      val scheme = url.substring(0, schemeEnd).toLowerCase
      val rest = url.substring(schemeEnd + 3)
      val authEnd = rest.indexWhere(c => c == '/' || c == '?' || c == '#') match {
        case -1 => rest.length
        case x => x
      }
      var auth = rest.substring(0, authEnd).toLowerCase
      if ((scheme == "http" && auth.endsWith(":80")) ||
        (scheme == "https" && auth.endsWith(":443")))
        auth = auth.substring(0, auth.lastIndexOf(':'))
      val tail0 = rest.substring(authEnd)
      val tail1 = tail0.indexOf('#') match {
        case -1 => tail0
        case x => tail0.substring(0, x)
      }
      val tail = if (tail1.endsWith("?")) tail1.dropRight(1) else tail1
      s"$scheme://$auth$tail"
    } catch { case _: Exception => url }
  }

  /** Host of a URL (lowercased, port stripped), or NULL when there is
    * no parseable authority — the key for per-domain caps and
    * blocklist joins.
    */
  private[graft] def urlHostKernel(url: String): String = {
    if (url == null) return null
    val schemeEnd = url.indexOf("://")
    if (schemeEnd <= 0) return null
    val rest = url.substring(schemeEnd + 3)
    val authEnd = rest.indexWhere(c => c == '/' || c == '?' || c == '#') match {
      case -1 => rest.length
      case x => x
    }
    val auth = rest.substring(0, authEnd).toLowerCase
    val host = auth.lastIndexOf(':') match {
      case -1 => auth
      case x if auth.substring(x + 1).forall(_.isDigit) => auth.substring(0, x)
      case _ => auth
    }
    if (host.isEmpty) null else host
  }

  /** Query parameters that carry click/campaign attribution, not
    * resource identity — the utm family plus the big ad/mail-platform
    * click ids. Two spellings of the same page differing only in
    * these defeat URL dedup and per-URL caps; the conservative list
    * deliberately EXCLUDES ambiguous names like `ref`/`source` that
    * some sites use for routing.
    */
  val TrackingParams: Set[String] = Set(
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "utm_id", "gclid", "dclid", "fbclid", "msclkid", "twclid", "igshid",
    "mc_cid", "mc_eid", "_hsenc", "_hsmi", "mkt_tok")

  /** Drop [[TrackingParams]] from a URL's query string, preserving
    * the order of the surviving parameters (reordering changes
    * semantics on real endpoints — the [[normalizeUrlKernel]] rule);
    * a fully-tracking query loses its `?`. Everything before the
    * query is untouched, so this composes after normalization.
    */
  private[graft] def stripTrackingParamsKernel(url: String): String = {
    if (url == null) return null
    val qIdx = url.indexOf('?')
    if (qIdx < 0) return url
    val fIdx = url.indexOf('#', qIdx)
    val end = if (fIdx < 0) url.length else fIdx
    val kept = url
      .substring(qIdx + 1, end)
      .split("&", -1)
      .filter { p =>
        val eq = p.indexOf('=')
        val name = (if (eq < 0) p else p.substring(0, eq))
          .toLowerCase(java.util.Locale.ROOT)
        !TrackingParams.contains(name)
      }
    val base = url.substring(0, qIdx)
    val tail = url.substring(end)
    if (kept.isEmpty) base + tail
    else base + "?" + kept.mkString("&") + tail
  }

  // NOT private: whole-stage codegen generates Java that invokes the
  // field accessors directly, and Janino cannot resolve methods on a
  // Scala-private nested class — every query touching url parts was
  // silently falling back to interpreted projection (ERROR CodeGenerator
  // in the logs) until the modifier was dropped
  final case class UrlParts(url_norm: String, url_host: String)

  /** Add `url_norm` and `url_host` columns for a URL column — ONE
    * parse per row (the host reads the already-normalized spelling),
    * not two independent scans of the raw string. `stripTracking`
    * additionally removes [[TrackingParams]] from `url_norm` (default
    * off: byte-stable output for existing callers) — with it on, two
    * crawls of the same page via different campaigns dedup to one
    * URL.
    */
  def withUrlParts(
      df: DataFrame,
      urlCol: String,
      stripTracking: Boolean = false,
  ): DataFrame = {
    val u = udf { (s: String) =>
      if (s == null) null
      else {
        val norm0 = normalizeUrlKernel(s)
        val norm = if (stripTracking) stripTrackingParamsKernel(norm0) else norm0
        UrlParts(norm, urlHostKernel(norm))
      }
    }
    df.withColumn("__u", u(col(urlCol)))
      .withColumn("url_norm", col("__u.url_norm"))
      .withColumn("url_host", col("__u.url_host"))
      .drop("__u")
  }

  /** Keep the LATEST capture per normalized URL — the cross-snapshot
    * compaction a Common Crawl-style pipeline runs before
    * content-level dedup: monthly snapshots re-crawl the same pages,
    * and keeping every capture wastes downstream compute and biases
    * the corpus toward frequently-crawled hosts. One capture
    * survives per `url_norm` — newest `tsCol`, ties broken to the
    * SMALLEST `idCol` for determinism; `stripTracking` defaults ON
    * here (unlike [[withUrlParts]]) because campaign spellings of one
    * page are exactly the multi-capture case this exists to collapse.
    *
    * Scale shape: one hash exchange on url_norm + a row_number
    * window — the same single-exchange shape as exact dedup; text
    * moves once. Batch-only by DESIGN: keep-latest cannot stream in
    * append mode (a later arrival would have to retract the earlier
    * winner), so this is the periodic batch compaction, while
    * streaming ingest dedups content-wise
    * ([[graft.streaming.StreamingDedup]]).
    */
  def latestCapture(
      df: DataFrame,
      idCol: String,
      urlCol: String,
      tsCol: String,
      stripTracking: Boolean = true,
  ): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("url_norm"))
      .orderBy(col(tsCol).desc, col(idCol).asc)
    withUrlParts(df, urlCol, stripTracking)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** All dot-suffix domains of a host as a column expression:
    * `a.b.example.com` → `[a.b.example.com, b.example.com,
    * example.com, com]`. NULL/empty hosts give an empty list. Pure
    * `functions` arithmetic, DuckDB-replayable (oracle q114).
    */
  def hostSuffixes(host: Column): Column = {
    val parts = filter(split(host, "\\."), p => p =!= lit(""))
    when(host.isNotNull && size(parts) > 0,
      transform(
        sequence(lit(0), size(parts) - 1),
        i => array_join(slice(parts, i + 1, size(parts) - i), ".")))
      .otherwise(array().cast("array<string>"))
  }

  /** Drop documents whose host matches a domain blocklist — the
    * standard web-pipeline exclusion list (spam/adult/boilerplate
    * domain feeds run to millions of entries). An entry blocks the
    * exact host AND every subdomain (`example.com` blocks
    * `a.b.example.com`), which is the AdBlock/UT1-list convention.
    *
    * Scale shape: each document explodes into its ≤label-depth host
    * suffixes (a handful) and LEFT SEMI joins the blocklist on the
    * suffix — so a million-entry blocklist is a plain equi-join
    * (broadcast when small, shuffle when not; Catalyst picks), never
    * a per-row scan of the list and never a regex. The survivor set
    * comes back via LEFT ANTI on the id — two joins, both on narrow
    * (id, suffix) projections; text never moves.
    */
  /** Ceiling for the STREAMING blocklist broadcast set: ~50 M domains
    * ≈ several hundred MB of driver + per-executor heap, the
    * practical broadcast bound. ENFORCED (not just documented) so an
    * oversized list fails fast with guidance instead of surfacing as
    * an opaque executor OOM mid-stream.
    */
  val MaxStreamBlocklistDomains: Long = 50000000L

  def filterBlockedHosts(
      df: DataFrame,
      idCol: String,
      hostCol: String,
      blocklist: DataFrame,
      domainCol: String = "domain",
      maxBroadcastDomains: Long = MaxStreamBlocklistDomains,
  ): DataFrame = {
    // both sides case-fold: a crawled "Ads.BAD.com" must hit a
    // "bad.com" entry (hosts are case-insensitive per RFC 4343)
    if (df.isStreaming) {
      // streaming: the explode→distinct→anti-join shape would be a
      // stateful aggregation plus a stream-stream self-join (not
      // append-supported). The list collapses to a broadcast set and
      // the check becomes a stateless per-row filter — streams as-is.
      // ONE evaluation of the static frame: collect at most
      // ceiling+1 rows and check the materialized size, so the
      // ceiling and the shipped set can never disagree (a separate
      // count() job could see a different result on a
      // nondeterministic or concurrently-rewritten frame). Under the
      // ceiling, limit(n+1) returns the COMPLETE list.
      val collected = blocklist
        .select(lower(col(domainCol)))
        .limit(math.min(maxBroadcastDomains + 1, Int.MaxValue.toLong).toInt)
        .collect()
      require(collected.length <= maxBroadcastDomains,
        s"streaming blocklist has over $maxBroadcastDomains entries, the broadcast " +
          "ceiling — a set this size cannot ship to every executor; pre-filter in batch " +
          "mode instead (filterBlockedHosts on a static frame is an equi-join with no " +
          "ceiling), or raise maxBroadcastDomains deliberately if the cluster has the heap")
      val domains = collected.map(_.getString(0)).toSet
      val bc = df.sparkSession.sparkContext.broadcast(domains)
      val blockedUdf = udf { (host: String) =>
        if (host == null) false
        else {
          val h = host.toLowerCase
          var i = 0
          var blocked = bc.value.contains(h)
          while (!blocked && i >= 0) {
            i = h.indexOf('.', i)
            if (i >= 0) { i += 1; blocked = bc.value.contains(h.substring(i)) }
          }
          blocked
        }
      }
      df.where(!blockedUdf(col(hostCol)))
    } else {
      val blockedIds = df
        .select(
          col(idCol).as("__bid"),
          explode(hostSuffixes(lower(col(hostCol)))).as("__sfx"))
        .join(
          blocklist.select(lower(col(domainCol)).as("__sfx")),
          Seq("__sfx"),
          "left_semi")
        .select(col("__bid"))
        .distinct()
      df.join(blockedIds, col(idCol) === col("__bid"), "left_anti")
    }
  }
}
