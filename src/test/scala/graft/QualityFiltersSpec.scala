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
}
