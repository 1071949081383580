package graft

import graft.operators.QualityFilters

class QualityFiltersSpec extends SparkTestBase {
  import spark.implicits._

  private val goodDoc = {
    val base = "the data and model pipeline have that sort of careful work " +
      "to be done with many diverse sources and long running jobs "
    (base * 3).trim // 22 mean-len-safe words, repeated past the 50-word floor
  }

  test("a clean prose document passes every rule") {
    val out = QualityFilters.withGopherFlags(Seq((1L, goodDoc)).toDF("id", "text"), "text")
      .select("pass", "n_words").as[(Boolean, Long)].head()
    assert(out._1, s"good doc failed, n_words=${out._2}")
    assert(out._2 >= 50)
  }

  test("each rule fails on its planted violation, independently") {
    val cases = Seq(
      // (text, failing column)
      ("too short the of and", "ok_word_count"),
      (Seq.fill(60)("a").mkString(" ") + " the of and", "ok_mean_word_len"), // mean len < 3
      (goodDoc + " " + Seq.fill(40)("#tag").mkString(" "), "ok_symbol_ratio"),
      ((1 to 60).map(i => s"- bullet item $i the of").mkString("\n"), "ok_bullet_lines"),
      ((1 to 60).map(i => s"line $i the of and trails...").mkString("\n"), "ok_ellipsis_lines"),
      (goodDoc + " " + Seq.fill(60)("12345").mkString(" "), "ok_alpha_words"),
      (Seq.fill(60)("wordy lexeme corpus").mkString(" "), "ok_stopwords"),
    )
    val flagged = QualityFilters
      .withGopherFlags(cases.zipWithIndex.map { case ((t, _), i) => (i.toLong, t) }
        .toDF("id", "text"), "text")
      .orderBy("id")
      .collect()
    cases.zipWithIndex.foreach { case ((_, failCol), i) =>
      val row = flagged(i)
      assert(!row.getAs[Boolean](failCol), s"case $i should fail $failCol")
      assert(!row.getAs[Boolean]("pass"), s"case $i should not pass")
    }
  }

  test("empty and null text fail everything without crashing") {
    val out = QualityFilters
      .withGopherFlags(Seq((1L, ""), (2L, null: String)).toDF("id", "text"), "text")
      .select("n_words", "pass").as[(Long, Boolean)].collect()
    assert(out.forall(r => r._1 == 0L && !r._2))
  }

  test("gopherFilter keeps passers and drops the flag columns") {
    val df = Seq((1L, goodDoc), (2L, "too short")).toDF("id", "text")
    val kept = QualityFilters.gopherFilter(df, "text")
    assert(kept.columns.toSeq == Seq("id", "text"))
    assert(kept.select("id").as[Long].collect().toSeq == Seq(1L))
  }

  // ------------------------------------------- language-conditioned

  private val goodRu = {
    val base = "собака сидит дома и не хочет идти гулять с нами по улице " +
      "сегодня вечером потому что погода очень плохая и холодная "
    (base * 4).trim
  }

  test("byLang: a fluent Russian document passes with the ru profile") {
    val out = QualityFilters
      .withGopherFlagsByLang(Seq((1L, goodRu, "ru")).toDF("id", "text", "lang"), "text", "lang")
      .select("gopher_scoped", "pass", "ok_alpha_words", "ok_stopwords")
      .as[(Boolean, Boolean, Boolean, Boolean)].head()
    assert(out == ((true, true, true, true)), out.toString)
    // the English-scoped bundle would have rejected it outright: the
    // ASCII alpha test sees zero alpha words in Cyrillic
    val en = QualityFilters
      .withGopherFlags(Seq((1L, goodRu)).toDF("id", "text"), "text")
      .select("ok_alpha_words", "pass").as[(Boolean, Boolean)].head()
    assert(en == ((false, false)), en.toString)
  }

  test("byLang: garbage in a profiled language still fails its bundle") {
    val garbage = Seq.fill(60)("### 12345 …").mkString(" ")
    val out = QualityFilters
      .withGopherFlagsByLang(
        Seq((1L, garbage, "ru"), (2L, garbage, "en")).toDF("id", "text", "lang"),
        "text", "lang")
      .select("pass").as[Boolean].collect()
    assert(out.forall(!_))
  }

  test("byLang: out-of-scope languages pass through for the LM path") {
    val zh = "今天天气很好我们一起去公园散步然后吃晚饭"
    val out = QualityFilters
      .withGopherFlagsByLang(
        Seq((1L, zh, "zh"), (2L, zh, "und"), (3L, zh, null: String))
          .toDF("id", "text", "lang"),
        "text", "lang")
      .select("gopher_scoped", "pass").as[(Boolean, Boolean)].collect()
    assert(out.forall(r => !r._1 && r._2), out.mkString(","))
    val kept = QualityFilters.gopherFilterByLang(
      Seq((1L, zh, "zh")).toDF("id", "text", "lang"), "text", "lang")
    assert(kept.columns.toSeq == Seq("id", "text", "lang"))
    assert(kept.count() == 1L)
  }

  test("byLang: session-2 profiles (pt/ro/cs/vi) scope fluent text in and garbage out") {
    val fluent = Seq(
      "pt" -> "as crianças brincam juntas no parque com os amigos hoje",
      "ro" -> "copiii se joacă împreună în parcul mare cu prietenii lor",
      "cs" -> "děti si hrají spolu v parku a slunce krásně svítí",
      "vi" -> "các em nhỏ chơi đùa cùng nhau trong công viên xanh đẹp",
    )
    val garbage = Seq.fill(60)("### 12345 …").mkString(" ")
    val rows = fluent.zipWithIndex.flatMap { case ((l, s), i) =>
      Seq((i.toLong, Seq.fill(8)(s).mkString(" "), l),
        (i.toLong + 100L, garbage, l))
    }
    val out = QualityFilters
      .withGopherFlagsByLang(rows.toDF("id", "text", "lang"), "text", "lang")
      .select("id", "gopher_scoped", "pass")
      .as[(Long, Boolean, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    fluent.zipWithIndex.foreach { case ((l, _), i) =>
      assert(out(i.toLong) == ((true, true)), s"$l fluent must be scoped and pass")
      assert(out(i.toLong + 100L) == ((true, false)), s"$l garbage must be scoped and fail")
    }
  }

  test("byLang: English results identical to the unconditioned bundle") {
    val docs = Seq((1L, goodDoc), (2L, "too short the of and"))
    val un = QualityFilters.withGopherFlags(docs.toDF("id", "text"), "text")
      .orderBy("id").drop("text").collect().map(_.toSeq)
    val by = QualityFilters
      .withGopherFlagsByLang(docs.map { case (i, t) => (i, t, "en") }
        .toDF("id", "text", "lang"), "text", "lang")
      .orderBy("id").drop("text", "lang", "gopher_scoped").collect().map(_.toSeq)
    assert(un.toSeq == by.toSeq)
  }

  // ---------------------------------------------------------- C4 rules

  private val keptLine = "the data pipeline runs every careful job today."

  test("c4: each line rule drops exactly its planted line") {
    val doc = Seq(
      keptLine,                                         // kept
      "too short.",                                     // < 5 words
      "this line has five words here no punctuation",   // no terminal punct
      "please enable JavaScript to view this page.",    // drop phrase
      "we updated our Privacy Policy terms again.",     // drop phrase
      "he said the model \"just works\" and left?",     // kept (ends ?)
      "the quoted answer was \"forty two.\"",           // kept (ends ")
    ).mkString("\n")
    val out = QualityFilters.withC4Flags(Seq((1L, doc)).toDF("id", "text"), "text")
      .select("clean_text", "n_lines_kept", "n_lines_dropped", "n_sentences", "pass")
      .as[(String, Long, Long, Long, Boolean)].head()
    assert(out._1.split("\n").toSeq == Seq(
      keptLine,
      "he said the model \"just works\" and left?",
      "the quoted answer was \"forty two.\""))
    assert(out._2 == 3L && out._3 == 4L)
    assert(out._4 == 3L) // '.', '?', '.' in the retained text
    assert(out._5)
  }

  test("c4: each document rule fails independently") {
    val three = Seq(keptLine, keptLine, keptLine).mkString("\n")
    val cases = Seq(
      (1L, three + "\nthe sample mentions lorem ipsum dolor here.", "has_lorem_ipsum"),
      (2L, three + "\nthe code sample shows { braces } clearly.", "has_brace"),
      (3L, three + "\ncome gamble with us tonight my friend.", "has_bad_word"),
      (4L, keptLine, "n_sentences"), // 1 sentence < 3
    )
    val out = QualityFilters
      .withC4Flags(cases.map(c => (c._1, c._2)).toDF("id", "text"), "text",
        badwords = Seq("gamble"))
      .orderBy("id").collect()
    cases.zipWithIndex.foreach { case ((_, _, failCol), i) =>
      assert(!out(i).getAs[Boolean]("pass"), s"case $i should fail")
      if (failCol != "n_sentences")
        assert(out(i).getAs[Boolean](failCol), s"case $i should flag $failCol")
      else assert(out(i).getAs[Long]("n_sentences") < 3)
    }
    // the three-line doc with no plant passes
    val ok = QualityFilters.withC4Flags(Seq((9L, three)).toDF("id", "text"), "text",
      badwords = Seq("gamble"))
    assert(ok.select("pass").as[Boolean].head())
  }

  test("c4: badword matches whole tokens only, case-insensitively") {
    val three = Seq(keptLine, keptLine, keptLine).mkString("\n")
    val out = QualityFilters
      .withC4Flags(
        Seq((1L, three + "\nthe Gamble was lost by everyone there."),
          (2L, three + "\nthe gambler was lucky this fine evening."))
          .toDF("id", "text"),
        "text", badwords = Seq("gamble"))
      .orderBy("id").select("has_bad_word").as[Boolean].collect()
    assert(out.toSeq == Seq(true, false)) // substring "gambler" must NOT match
  }

  test("c4: soft-404 docPhrases flag placeholder pages; off by default") {
    val three = Seq(keptLine, keptLine, keptLine).mkString("\n")
    val soft = three + "\nsorry the Page Not Found error appeared."
    val out = QualityFilters
      .withC4Flags(Seq((1L, soft), (2L, three)).toDF("id", "text"), "text",
        docPhrases = QualityFilters.defaultSoft404Phrases)
      .orderBy("id").select("has_drop_phrase", "pass").as[(Boolean, Boolean)].collect()
    assert(out.toSeq == Seq((true, false), (false, true)))
    // default (no docPhrases): the same page passes untouched
    val dflt = QualityFilters.withC4Flags(Seq((1L, soft)).toDF("id", "text"), "text")
      .select("has_drop_phrase", "pass").as[(Boolean, Boolean)].head()
    assert(dflt == ((false, true)))
  }

  test("c4: empty and null text fail without crashing; c4Clean swaps text") {
    val out = QualityFilters
      .withC4Flags(Seq((1L, ""), (2L, null: String)).toDF("id", "text"), "text")
      .select("n_sentences", "pass").as[(Long, Boolean)].collect()
    assert(out.forall(r => r._1 == 0L && !r._2))
    val three = Seq(keptLine, "no punct line here at all", keptLine, keptLine).mkString("\n")
    val cleaned = QualityFilters.c4Clean(
      Seq((1L, three), (2L, "too short.")).toDF("id", "text"), "text")
    assert(cleaned.columns.toSeq == Seq("id", "text"))
    val rows = cleaned.as[(Long, String)].collect().toSeq
    assert(rows.map(_._1) == Seq(1L))
    assert(rows.head._2 == Seq(keptLine, keptLine, keptLine).mkString("\n"))
  }

  test("line signals: split keeps trailing empties, lengths count code points, ratios exact") {
    import graft.operators.QualityFilters.lineSignalsKernel
    // "ab", "", "cdef", "" — the trailing newline makes a 4th (empty)
    // line, the case Java's default split silently drops
    val s = lineSignalsKernel("ab\n\ncdef\n")
    assert(s.n_lines_ls == 4L, s)
    assert(s.max_line_len == 4L && s.sum_line_len == 6L, s)
    assert(s.avg_line_len == 6.0 / 4, s)
    assert(s.n_alnum_cp == 6L && s.n_cp == 9L, s)
    assert(s.frac_alnum.contains(6.0 / 9), s)
    // astral plane: 𝄞 is one code point but two UTF-16 units
    val astral = lineSignalsKernel("𝄞a")
    assert(astral.max_line_len == 2L && astral.n_cp == 2L, astral)
    assert(astral.n_alnum_cp == 1L, astral)
    // empty and null: one empty line, null ratio — no 0/0 artifact
    Seq("", null: String).foreach { t =>
      val e = lineSignalsKernel(t)
      assert(e.n_lines_ls == 1L && e.sum_line_len == 0L && e.avg_line_len == 0.0, e)
      assert(e.n_cp == 0L && e.frac_alnum.isEmpty, e)
    }
    val df = QualityFilters.withLineSignals(
      Seq((1L, "ab\n\ncdef\n")).toDF("id", "text"), "text")
    assert(df.select("n_lines_ls", "max_line_len").as[(Long, Long)].head() == ((4L, 4L)))
  }

  test("compressibility: repeated text lands far below 0.15, hex soup far above 0.35") {
    import graft.operators.QualityFilters.compressibilityKernel
    val rep = compressibilityKernel(
      "the quick brown fox jumps over the lazy dog and the cat naps. " * 64, 6)
    assert(rep.compression_ratio.exists(_ < 0.08), rep)
    val md = java.security.MessageDigest.getInstance("MD5")
    val soup = Iterator
      .iterate("seed")(x =>
        md.digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString)
      .drop(1).take(64).mkString
    val hi = compressibilityKernel(soup, 6)
    assert(hi.raw_len == 2048L, hi)
    assert(hi.compression_ratio.exists(_ > 0.45), hi)
    // deterministic within one zlib build: same input, same length
    assert(compressibilityKernel(soup, 6).deflate_len == hi.deflate_len)
    // empty/null: zero lengths, null ratio
    Seq("", null: String).foreach { t =>
      val e = compressibilityKernel(t, 6)
      assert(e.raw_len == 0L && e.deflate_len == 0L && e.compression_ratio.isEmpty, e)
    }
    val df = QualityFilters.withCompressibility(
      Seq((1L, soup)).toDF("id", "text"), "text")
    assert(df.select("raw_len").as[Long].head() == 2048L)
    intercept[IllegalArgumentException] {
      QualityFilters.withCompressibility(Seq((1L, "x")).toDF("id", "text"), "text", level = 10)
    }
  }
}
