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
}
