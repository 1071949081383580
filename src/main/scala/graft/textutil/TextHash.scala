package graft.textutil

/** The text→signature primitives shared by every dedup/fingerprint
  * operator and their native Catalyst expressions: Unicode-word
  * tokenization, streamed FNV-1a shingle hashing, splitmix64 mixing,
  * densified one-permutation MinHash, frequency-weighted 64-bit
  * SimHash, and winnowing (MOSS) fingerprints.
  *
  * Everything here works on primitive `long[]` with no boxing — these
  * run once per document per operator, so at corpus scale they ARE the
  * signature cost. Semantics are locked by DedupSpec's oracle-parity
  * tests (scanner ≡ `lower(text) split [^\p{L}\p{N}_]+`, streamed
  * shingle hash ≡ `fnv64("tok₁ tok₂ …")`), so the DuckDB-oracle
  * queries built on top stay bit-exact.
  */
object TextHash {

  /** The word-separator class every word-level tokenizer in the engine
    * splits on, and that every DuckDB oracle replays: runs of anything
    * that is not a Unicode letter (`\p{L}`), Unicode number (`\p{N}`),
    * or underscore. Java regex and DuckDB's RE2 interpret this class
    * identically (both are Unicode-category based, unlike `\w`, which
    * is ASCII in RE2 and in Java without UNICODE_CHARACTER_CLASS — the
    * ASCII `\W+` convention this replaced silently tokenized all
    * non-Latin text to zero tokens).
    */
  val WordSplitRe = "[^\\p{L}\\p{N}_]+"

  /** `lower(text).split(WordSplitRe).filter(_.nonEmpty)` without the
    * regex engine: one code-point scan with the exact
    * `[\p{L}\p{N}_]` class (Unicode general categories L* and N*
    * plus underscore — identical in Java regex and DuckDB's RE2).
    * Lowercasing is Locale.ROOT so é/Я/Ω fold deterministically
    * regardless of JVM default locale; caseless scripts (CJK, Arabic,
    * Hebrew, Devanagari) pass through untouched.
    */
  def tokenize(text: String): Array[String] = {
    val s = text.toLowerCase(java.util.Locale.ROOT)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && !isWordCp(s.codePointAt(i))) i += Character.charCount(s.codePointAt(i))
      val start = i
      while (i < len && isWordCp(s.codePointAt(i))) i += Character.charCount(s.codePointAt(i))
      if (i > start) out += s.substring(start, i)
    }
    out.toArray
  }

  /** `[\p{L}\p{N}_]` on a code point: the five L* categories, the
    * three N* categories (Nd/Nl/No — note `Character.isDigit` is Nd
    * only, narrower than `\p{N}`), and underscore. ASCII fast path
    * first — the overwhelmingly common case in mixed corpora.
    */
  @inline private def isWordCp(cp: Int): Boolean =
    if (cp < 128)
      (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') || (cp >= '0' && cp <= '9') || cp == '_'
    else {
      val t = Character.getType(cp)
      t == Character.UPPERCASE_LETTER || t == Character.LOWERCASE_LETTER ||
      t == Character.TITLECASE_LETTER || t == Character.MODIFIER_LETTER ||
      t == Character.OTHER_LETTER || t == Character.DECIMAL_DIGIT_NUMBER ||
      t == Character.LETTER_NUMBER || t == Character.OTHER_NUMBER
    }

  /** Distinct word n-gram STRINGS in first-occurrence order — one
    * tokenize pass per document. Semantics identical to
    * `array_distinct(transform(...))` over `lower`/word-split tokens (the
    * HOF formulation re-tokenizes the text once PER GRAM and runs
    * interpreted — this kernel replaced it after a 10× showing in the
    * q64 stage probe). Sub-n-token docs yield an empty array.
    */
  def distinctWordNgrams(text: String, n: Int): Array[String] = {
    if (text == null) return Array.empty[String]
    val toks = tokenize(text)
    if (toks.length < n) return Array.empty[String]
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + n <= toks.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    seen.toArray(new Array[String](seen.size))
  }

  /** `wordShingles(text, n).map(fnv64)` WITHOUT materializing the
    * shingle strings: the FNV-1a stream of `"tok_i … tok_i+n-1"` is fed
    * char-by-char straight from the token array (bit-identical to
    * hashing the joined string).
    */
  def hashedShingles(text: String, n: Int): Array[Long] = {
    if (text == null) return Array.emptyLongArray
    hashedShinglesFromToks(tokenize(text), n)
  }

  /** [[hashedShingles]] from an already-tokenized array — for kernels
    * that need the token array AND its window hashes (span excision),
    * so the text is tokenized once, not twice. Bit-identical stream.
    */
  def hashedShinglesFromToks(toks: Array[String], n: Int): Array[Long] = {
    if (toks.length < n) return Array.emptyLongArray
    val out = new Array[Long](toks.length - n + 1)
    var i = 0
    while (i < out.length) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < n) {
        if (j > 0) { h ^= ' '; h *= 0x100000001b3L }
        val t = toks(i + j)
        var k = 0
        while (k < t.length) { h ^= t.charAt(k); h *= 0x100000001b3L; k += 1 }
        j += 1
      }
      out(i) = h
      i += 1
    }
    out
  }

  /** Sorted distinct `mix64(fnv64(shingle))` set — the canonical
    * shingle-hash representation every verify path does set algebra
    * on. Primitive sort + in-place dedupe (the `.distinct.sorted` this
    * replaces boxed every element twice).
    */
  def sortedShingleSet(text: String, n: Int): Array[Long] = {
    val hs = hashedShingles(text, n)
    if (hs.isEmpty) return hs
    var i = 0
    while (i < hs.length) { hs(i) = mix64(hs(i)); i += 1 }
    java.util.Arrays.sort(hs)
    // in-place dedupe of the sorted array
    var w = 0
    i = 1
    while (i < hs.length) {
      if (hs(i) != hs(w)) { w += 1; hs(w) = hs(i) }
      i += 1
    }
    if (w + 1 == hs.length) hs else java.util.Arrays.copyOf(hs, w + 1)
  }

  /** Densified-OPH MinHash signature (Li/Owen/Zhang NIPS'12;
    * Shrivastava densification) of a distinct shingle-hash set: each
    * hash routes to bucket `h mod k` keeping the per-bucket min; empty
    * buckets borrow rotationally (mixed with hop distance). Empty
    * input → all-sentinel signature (callers filter shingle-less docs).
    */
  def ophSignature(grams: Array[Long], numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < grams.length) {
      val h = grams(i)
      val bin = java.lang.Long.remainderUnsigned(h, numHashes).toInt
      if (h < sig(bin)) sig(bin) = h
      i += 1
    }
    if (grams.nonEmpty) {
      var b = 0
      while (b < numHashes) {
        if (sig(b) == Long.MaxValue) {
          var hops = 1
          var j = (b + 1) % numHashes
          while (sig(j) == Long.MaxValue) { j = (j + 1) % numHashes; hops += 1 }
          sig(b) = mix64(sig(j) + hops)
        }
        b += 1
      }
    }
    sig
  }

  /** 64-bit SimHash over word unigrams, token-frequency weighted
    * (each occurrence contributes ±1 per bit — identical to weighting
    * by count). Null/empty → 0L.
    */
  def simhash64(text: String): Long = {
    if (text == null) return 0L
    val toks = tokenize(text)
    val acc = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val h = fnv64(toks(t))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Winnowing fingerprint signature (Schleimer et al. SIGMOD'03):
    * whitespace-normalized lowercase text → rolling Rabin-Karp hashes
    * of char k-grams → min of each w-window, sorted distinct.
    */
  def winnowSignature(text: String, k: Int, w: Int): Array[Long] = {
    if (text == null) return Array.emptyLongArray
    val norm = text.toLowerCase.replaceAll("\\s+", " ").trim
    if (norm.length < k) return Array.emptyLongArray
    val n = norm.length - k + 1
    val hashes = new Array[Long](n)
    val B = 1000003L
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * B + norm.charAt(i); i += 1 }
    hashes(0) = h
    i = 1
    while (i < n) {
      h = (h - norm.charAt(i - 1) * pow) * B + norm.charAt(i + k - 1)
      hashes(i) = h
      i += 1
    }
    val win = math.max(1, w)
    val count = n - win + 1
    if (count <= 0) return Array.emptyLongArray
    val mins = new Array[Long](count)
    var s = 0
    while (s < count) {
      var mn = hashes(s)
      var j = s + 1
      while (j < s + win) { if (hashes(j) < mn) mn = hashes(j); j += 1 }
      mins(s) = mn
      s += 1
    }
    java.util.Arrays.sort(mins)
    var wr = 0
    i = 1
    while (i < mins.length) {
      if (mins(i) != mins(wr)) { wr += 1; mins(wr) = mins(i) }
      i += 1
    }
    if (wr + 1 == mins.length) mins else java.util.Arrays.copyOf(mins, wr + 1)
  }

  /** Hashed bag of word {1,2}-gram counts folded into `dim` buckets
    * (feature hashing / "hashing trick"), L2-normalized — the
    * fastText-style featurization a distilled quality classifier
    * scores the corpus with. One tokenize pass; bigram hashes are
    * streamed FNV-1a of `"tokᵢ tokᵢ₊₁"` exactly like
    * [[hashedShingles]], then splitmix-mixed before the modulo so
    * bucket assignment is uniform.
    */
  def hashedNgramFeatures(text: String, dim: Int): Array[Float] = {
    val acc = new Array[Float](dim)
    if (text == null) return acc
    val toks = tokenize(text)
    var i = 0
    while (i < toks.length) {
      acc(java.lang.Long.remainderUnsigned(mix64(fnv64(toks(i))), dim).toInt) += 1f
      if (i + 1 < toks.length) {
        var h = 0xcbf29ce484222325L
        val a = toks(i)
        var k = 0
        while (k < a.length) { h ^= a.charAt(k); h *= 0x100000001b3L; k += 1 }
        h ^= ' '
        h *= 0x100000001b3L
        val b = toks(i + 1)
        k = 0
        while (k < b.length) { h ^= b.charAt(k); h *= 0x100000001b3L; k += 1 }
        acc(java.lang.Long.remainderUnsigned(mix64(h), dim).toInt) += 1f
      }
      i += 1
    }
    var ss = 0.0
    i = 0
    while (i < dim) { ss += acc(i).toDouble * acc(i); i += 1 }
    if (ss > 0) {
      val inv = 1.0 / math.sqrt(ss)
      i = 0
      while (i < dim) { acc(i) = (acc(i) * inv).toFloat; i += 1 }
    }
    acc
  }

  /** FNV-1a over the chars of `s`. */
  def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** splitmix64 finalizer — cheap independent hash family generator. */
  def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
}
