package graft

import org.apache.spark.sql.functions._

import graft.operators.LmQuality

class LmQualitySpec extends SparkTestBase {
  import spark.implicits._

  test("bigram LM: hand-computed add-one probabilities") {
    val ref = Seq("a b a b").toDF("text")
    val lm = LmQuality.train(ref, "text", vocabSize = 10)
    assert(lm.vocab == Map("a" -> 0, "b" -> 1))
    assert(lm.v == 3)
    // corpus bigrams: (a,b) twice, (b,a) once
    val scored = LmQuality
      .score(Seq((1L, "a b"), (2L, "b b"), (3L, "c a"), (4L, "a")).toDF("id", "text"), "text", lm)
      .select($"id", $"avg_logprob")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(scored(1L).get == math.log(3.0 / 5.0), "p(b|a) = (2+1)/(2+3)")
    assert(scored(2L).get == math.log(1.0 / 4.0), "p(b|b) = (0+1)/(1+3)")
    assert(scored(3L).get == math.log(1.0 / 3.0), "OOV context: (0+1)/(0+3)")
    assert(scored(4L).isEmpty, "single-token docs score null")
  }

  test("in-domain text scores above gibberish; perplexity ordering matches") {
    val rng = new scala.util.Random(13)
    // structured prose: a Markov chain with few successors per word,
    // so in-domain bigrams are high-probability (uniform-random text
    // over a tiny vocab would score no better than OOV gibberish —
    // its entropy equals the smoothing penalty)
    val phrases = Seq(
      "the model reads data and writes clean output every day",
      "the model writes clean data and reads fresh output every night",
      "clean data helps the model every single day",
    )
    def sentence(): String =
      (0 until 3).map(_ => phrases(rng.nextInt(phrases.size))).mkString(" ")
    val ref = (0 until 200).map(_ => sentence()).toDF("text")
    val lm = LmQuality.train(ref, "text", vocabSize = 100)
    val probe = Seq(
      (1L, sentence()), // in-domain
      (2L, (0 until 30).map(_ => rng.alphanumeric.take(8).mkString).mkString(" ")), // gibberish
    ).toDF("id", "text")
    val s = LmQuality.score(probe, "text", lm)
      .select($"id", $"avg_logprob", $"perplexity")
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(s(1L)._1 > s(2L)._1 + 1.0,
      s"in-domain ${s(1L)._1} must beat gibberish ${s(2L)._1} by >1 nat")
    assert(s(2L)._2 > s(1L)._2, "perplexity ordering mirrors logprob")
  }
}
