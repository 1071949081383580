package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityClassifier
import graft.textutil.TextHash

class QualityClassifierSpec extends SparkTestBase {
  import spark.implicits._

  test("hashedNgramFeatures: fixed width, L2-normalized, deterministic, empty-safe") {
    val dim = 64
    val texts = Seq("the quick brown fox", "the quick brown fox", "buy now buy now", "")
    val got = texts.toDF("text")
      .select(graft.functions.TextSignatures.hashedNgramFeatures($"text", dim).as("f"))
      .as[Array[Float]]
      .collect()
    got.foreach(f => assert(f.length == dim))
    assert(got(0).toSeq == got(1).toSeq, "same text → same features")
    val norm = math.sqrt(got(0).map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5, s"L2 norm $norm")
    assert(got(3).forall(_ == 0f), "empty text → zero vector")
    // Catalyst path ≡ kernel
    assert(got(2).toSeq == TextHash.hashedNgramFeatures("buy now buy now", dim).toSeq)
  }

  test("distilled classifier separates planted good from bad documents") {
    val rng = new scala.util.Random(7)
    val goodWords = Seq("the", "science", "of", "language", "models", "requires", "careful",
      "data", "curation", "and", "measurement", "across", "many", "diverse", "sources")
    val good = (0 until 120).map { i =>
      (i.toLong, (0 until 40).map(_ => goodWords(rng.nextInt(goodWords.size))).mkString(" "), 1)
    }
    val bad = (0 until 120).map { i =>
      val spam = Seq("buy now", "click here", "free free free", "$$$ win $$$")(rng.nextInt(4))
      ((i + 1000).toLong, (spam + " ") * 8, 0)
    }
    val df = (good ++ bad).toDF("doc_id", "text", "label").repartition(4)
    QualityClassifier.train(df, "text", "label", "spec_quality", dim = 128, hidden = 16,
      configJson = """{"epochs":40}""")
    val scored = QualityClassifier.score(df, "text", "spec_quality", dim = 128)
      .select($"label", $"quality_prob")
      .collect()
    val goodMean = scored.filter(_.getInt(0) == 1).map(_.getDouble(1)).sum / 120
    val badMean = scored.filter(_.getInt(0) == 0).map(_.getDouble(1)).sum / 120
    assert(goodMean > badMean + 0.5, s"separation: good=$goodMean bad=$badMean")
    val acc = scored.count(r => (r.getDouble(1) >= 0.5) == (r.getInt(0) == 1)).toDouble / 240
    assert(acc > 0.9, s"train accuracy $acc")
  }
}
