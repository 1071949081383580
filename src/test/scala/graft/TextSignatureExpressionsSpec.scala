package graft

import org.apache.spark.sql.functions._

import graft.functions.TextSignatures
import graft.textutil.TextHash

/** The native signature expressions must be BIT-IDENTICAL to the Scala
  * UDF formulations they replaced (which the DuckDB-oracle queries were
  * validated against). Each test re-derives the legacy UDF result
  * independently and compares through the full Catalyst path (codegen
  * included — collected from a DataFrame, not evalled directly).
  */
class TextSignatureExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  private val texts = Seq(
    "The quick brown fox jumps over the lazy dog",
    "the quick  brown\tfox JUMPS over—the lazy dog!!",
    "a b",
    "",
    "   \t\n  ",
    "word",
    "über café façade ñandú 北京 东京 mixed ascii words",
    "KKelvin sign lower-casing edge", // U+212A lowercases to 'k'
    "numbers 123 and_underscores stay 456 connected_7",
    "x " * 500 + "repetitive tail",
  )

  private lazy val df = texts.toDF("text")

  test("shingleSet ≡ hashedShingles.map(mix64).distinct.sorted (legacy UDF math)") {
    val got = df.select(TextSignatures.shingleSet($"text", 3).as("g")).as[Array[Long]].collect()
    val want = texts.map(t => TextHash.hashedShingles(t, 3).map(TextHash.mix64).distinct.sorted)
    got.zip(want).zip(texts).foreach { case ((g, w), t) =>
      assert(g.toSeq == w.toSeq, s"shingleSet mismatch on: '${t.take(40)}'")
    }
  }

  test("shingleHashes ≡ hashedShingles (positions, duplicates, order all kept)") {
    val got = df.select(TextSignatures.shingleHashes($"text", 3).as("g"))
      .as[Array[Long]].collect()
    val want = texts.map(t => TextHash.hashedShingles(t, 3))
    got.zip(want).zip(texts).foreach { case ((g, w), t) =>
      assert(g.toSeq == w.toSeq, s"shingleHashes mismatch on: '${t.take(40)}'")
    }
  }

  test("minhashPrep sig/grams ≡ ophSignature over the sorted shingle set") {
    val got = df
      .select(TextSignatures.minhashPrep($"text", 3, 64).as("p"))
      .select($"p.sig", $"p.grams")
      .as[(Array[Long], Array[Long])]
      .collect()
    texts.zip(got).foreach { case (t, (sig, grams)) =>
      val wantGrams = TextHash.hashedShingles(t, 3).map(TextHash.mix64).distinct.sorted
      assert(grams.toSeq == wantGrams.toSeq, s"grams mismatch on: '${t.take(40)}'")
      assert(sig.toSeq == TextHash.ophSignature(wantGrams, 64).toSeq,
        s"sig mismatch on: '${t.take(40)}'")
      assert(sig.length == 64)
    }
  }

  test("simhash64 ≡ legacy frequency-weighted UDF math") {
    // the pre-native UDF: groupBy token counts, ±count per bit
    def legacy(text: String): Long = {
      val counts = TextHash.tokenize(text).groupBy(identity).view.mapValues(_.length)
      val acc = new Array[Int](64)
      counts.foreach { case (tok, w) =>
        val h = TextHash.fnv64(tok)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += w else acc(b) -= w
          b += 1
        }
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
      out
    }
    val got = df.select(TextSignatures.simhash64($"text").as("h")).as[Long].collect()
    texts.zip(got).foreach { case (t, h) =>
      assert(h == legacy(t), s"simhash mismatch on: '${t.take(40)}'")
    }
  }

  test("winnowSignature ≡ legacy SortedSet rolling-min UDF math") {
    def legacy(text: String, k: Int, w: Int): Seq[Long] = {
      val norm = text.toLowerCase.replaceAll("\\s+", " ").trim
      if (norm.length < k) Seq.empty
      else {
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
        val out = scala.collection.mutable.SortedSet.empty[Long]
        var s = 0
        val win = math.max(1, w)
        while (s + win <= n) {
          var mn = hashes(s)
          var j = s + 1
          while (j < s + win) { if (hashes(j) < mn) mn = hashes(j); j += 1 }
          out += mn
          s += 1
        }
        out.toSeq
      }
    }
    for ((k, w) <- Seq((8, 4), (5, 1), (4, 9))) {
      val got =
        df.select(TextSignatures.winnowSignature($"text", k, w).as("s")).as[Array[Long]].collect()
      texts.zip(got).foreach { case (t, s) =>
        assert(s.toSeq == legacy(t, k, w), s"winnow($k,$w) mismatch on: '${t.take(40)}'")
      }
    }
  }

  test("repetitionStats: hand-computed fixtures through the Catalyst path") {
    val fix = Seq(
      // "a a a b": 4 toks, 2 distinct, top=3/4; bigrams [a a, a a, a b]
      // → 1 dup of 3; trigrams [a a a, a a b] → 0 dups of 2
      ("a a a b", 4L, 2L, 3.0 / 4.0, 1.0 / 3.0, 0.0),
      // bigrams [buy now, now buy, buy now, now buy, buy now] → 2
      // distinct of 5; trigrams alternate between 2 patterns → 2 of 4
      ("buy now buy now buy now", 6L, 2L, 3.0 / 6.0, 3.0 / 5.0, 2.0 / 4.0),
      ("all distinct words here", 4L, 4L, 1.0 / 4.0, 0.0, 0.0),
      ("word", 1L, 1L, 1.0, 0.0, 0.0),
      ("", 0L, 0L, 0.0, 0.0, 0.0),
      ("Case CASE case!", 3L, 1L, 1.0, 1.0 / 2.0, 0.0),
    )
    val got = fix.map(_._1).toDF("text")
      .select(TextSignatures.repetitionStats($"text").as("r"))
      .select("r.n_word_tokens", "r.n_distinct_words", "r.top_token_frac",
        "r.dup_bigram_frac", "r.dup_trigram_frac")
      .collect()
    fix.zip(got).foreach { case ((t, n, d, top, bg, tg), row) =>
      assert(row.getLong(0) == n, s"n_tokens on '$t'")
      assert(row.getLong(1) == d, s"n_distinct on '$t'")
      assert(row.getDouble(2) == top, s"top_token_frac on '$t'")
      assert(row.getDouble(3) == bg, s"dup_bigram_frac on '$t'")
      assert(row.getDouble(4) == tg, s"dup_trigram_frac on '$t'")
    }
  }

  test("null text → null through every expression (operators coalesce/filter)") {
    val nd = Seq[Option[String]](None, Some("hello world one two three")).toDF("text")
    val r = nd
      .select(
        TextSignatures.shingleSet($"text", 3).as("a"),
        TextSignatures.minhashPrep($"text", 3, 16).as("b"),
        TextSignatures.simhash64($"text").as("c"),
        TextSignatures.winnowSignature($"text", 8, 4).as("d"),
      )
      .collect()
    assert(r(0).isNullAt(0) && r(0).isNullAt(1) && r(0).isNullAt(2) && r(0).isNullAt(3))
    assert(!r(1).isNullAt(0) && !r(1).isNullAt(1) && !r(1).isNullAt(2) && !r(1).isNullAt(3))
  }
}
