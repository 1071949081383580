package graft

import graft.operators.Bpe

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("train learns the classic merge sequence on a hand-checked corpus") {
    // word freqs: low×5, lower×2, newest×6, widest×3 (the textbook example)
    val docs = Seq(
      "low low low low low",
      "lower lower",
      "newest newest newest newest newest newest",
      "widest widest widest",
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val model = Bpe.train(docs, "text", numMerges = 4, sampleRows = 100, seed = 1L)
    // pair counts round 1: (e,s)=9 (newest 6 + widest 3), (s,t)=9, (t,</w>)=9,
    // (w,e)=8… tie at 9 breaks lexicographically: (e,s) < (s,t) < (t,</w>)
    assert(model.merges(0) == ("e", "s"), s"got ${model.merges.toSeq}")
    // round 2: ("es","t")=9 and (t,</w>)=9 tie → "es" < "t"
    assert(model.merges(1) == ("es", "t"))
    // round 3: ("est","</w>")=9 wins alone
    assert(model.merges(2) == ("est", "</w>"))
  }

  test("encode: merged subwords appear, round-trip preserves characters") {
    val docs = Seq(
      (1L, "low low low low low lower lower newest newest newest newest newest newest widest widest widest"),
    ).toDF("doc_id", "text")
    val model = Bpe.train(docs, "text", numMerges = 10, sampleRows = 100, seed = 1L)
    val enc = Bpe.encodeWord("newest", model.ranks)
    // "est</w>" must have fused into one token by merge 3
    assert(enc.exists(_.contains("est")), s"got ${enc.toSeq}")
    // round trip: concatenating tokens (minus the EOW marker) restores the word
    for (w <- Seq("newest", "lowest", "wide", "xyzzy", "a")) {
      val toks = Bpe.encodeWord(w, model.ranks)
      assert(toks.mkString.stripSuffix(Bpe.EndOfWord) == w, s"round-trip broke on $w")
      assert(toks.last.endsWith(Bpe.EndOfWord), s"last token must carry EOW: ${toks.toSeq}")
    }
  }

  test("withBpeTokens: distributed encode agrees with driver-side encodeWord") {
    val texts = Seq(
      (1L, "the quick brown fox"),
      (2L, "the the the lazy dog"),
      (3L, ""),
    )
    val df = texts.toDF("doc_id", "text").repartition(3)
    val model = Bpe.train(df, "text", numMerges = 20, sampleRows = 100, seed = 2L)
    val got = Bpe
      .withBpeTokens(df, "text", model)
      .select("doc_id", "bpe_tokens")
      .as[(Long, Seq[String])]
      .collect()
      .toMap
    texts.foreach { case (id, t) =>
      val want = graft.textutil.TextHash
        .tokenize(t)
        .flatMap(w => Bpe.encodeWord(w, model.ranks))
        .toSeq
      assert(got(id) == want, s"doc $id: ${got(id)} vs $want")
    }
  }
}
