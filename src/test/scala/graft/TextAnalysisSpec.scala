package graft

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, TextAnalysis}

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("tokenCount: whitespace semantics and edge cases") {
    val df = Seq(("a b  c"), (""), ("   "), ("single")).toDF("text")
    val out = df.select(TextAnalysis.tokenCount($"text")).as[Int].collect().toSeq
    assert(out == Seq(3, 0, 0, 1))
  }

  test("bpe estimate: at least word count, grows with long words") {
    val df = Seq(("short words here"), ("antidisestablishmentarianism")).toDF("text")
    val out = df.select(TextAnalysis.bpeTokenEstimate($"text")).as[Long].collect().toSeq
    assert(out.head >= 3)
    assert(out(1) >= 7) // 28 chars / 4
  }

  test("langId: recognizes real-language samples by script and stopwords") {
    val samples = Seq(
      ("en", "the cat sat on the mat and it was happy with all of this"),
      ("de", "der hund und die katze sind nicht mit dem mann im haus"),
      ("fr", "le chien et le chat sont dans la maison avec une femme"),
      ("es", "el perro y el gato están en la casa con una mujer y no hay más"),
      ("zh", "今天天气很好我们一起去公园散步吧然后吃晚饭"),
      ("ru", "сегодня хорошая погода мы идем гулять в парк вместе"),
      ("ja", "今日はいい天気ですね公園へ散歩に行きましょう"),
    ).toDF("expected", "text")
    val out = TextAnalysis
      .withLangId(samples, "text")
      .select("expected", "lang_pred")
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
    out.foreach { case (exp, got) => assert(got == exp, s"expected $exp got $got") }
  }

  test("langId: degenerate inputs → und") {
    val df = Seq(("123 456 789"), (""), ("!!! ???")).toDF("text")
    val out = TextAnalysis.withLangId(df, "text").select("lang_pred").as[String].collect()
    assert(out.forall(_ == "und"))
  }

  test("quality score: prose scores higher than digit/punct soup") {
    val df = Seq(
      ("good", "the quick brown fox jumps over the lazy dog and runs far away to the forest with great speed today"),
      ("digits", "123 456 789 012 345 678 901 234 567 890 111 222 333 444 555 666 777 888 999 000"),
      ("punct", ",,, ... ;;; !!! ??? ((( ))) [[[ ]]] {{{ }}} --- ,,, ... ;;; !!! ??? ((( ))) [[["),
    ).toDF("name", "text")
    val scores = TextAnalysis
      .qualityScore(df, "text")
      .select("name", "quality_score")
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap
    assert(scores("good") > scores("digits"), scores.toString)
    assert(scores("good") > scores("punct"), scores.toString)
    assert(scores("good") > 0.5)
  }

  test("winnowing fingerprints: shared window between overlapping docs, content fingerprint whitespace-insensitive") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha  beta gamma delta epsilon zeta eta theta"), // extra space
      (3L, "totally different words without any overlap whatsoever"),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.withFingerprints(df, "text").collect()
    val fp = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fingerprint")).toMap
    assert(fp(1L) == fp(2L), "normalized whitespace must not change content fingerprint")
    assert(fp(1L) != fp(3L))
    val sigs = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Seq[Long]]("winnow_sig").toSet).toMap
    assert(sigs(1L).intersect(sigs(3L)).isEmpty === false || sigs(1L).intersect(sigs(3L)).isEmpty,
      "winnow sets exist") // shape check
    assert(sigs(1L).nonEmpty && sigs(3L).nonEmpty)
    assert(sigs(1L).intersect(sigs(2L)).size.toDouble / sigs(1L).size > 0.7,
      "near-identical docs share most winnow fingerprints")
  }

  test("multimodal: magic-number sniffing + stub plumbing shapes") {
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++ Array.fill[Byte](100)(7)
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++ Array.fill[Byte](50)(3)
    val df = Seq((1L, png), (2L, jpeg), (3L, "plain".getBytes)).toDF("id", "payload")
    val out = Multimodal.withDecodedMeta(df, "payload")
      .select($"id", $"media_meta.format".as("fmt"), $"media_meta.n_bytes".as("nb"))
      .collect()
      .map(r => r.getAs[Long]("id") -> (r.getAs[String]("fmt"), r.getAs[Long]("nb")))
      .toMap
    assert(out(1L)._1 == "png" && out(1L)._2 == 108L)
    assert(out(2L)._1 == "jpeg")
    assert(out(3L)._1 == "bin")
    val resized = df.select(Multimodal.resizeStubUdf(64)($"payload").as("r"))
      .select(length($"r")).as[Int].collect()
    assert(resized.forall(_ == 64))
    val frames = df.select(Multimodal.frameSampleUdf(16, 2)($"payload").as("f"))
      .select(size($"f")).as[Int].collect()
    assert(frames.forall(_ >= 1))
  }
}
