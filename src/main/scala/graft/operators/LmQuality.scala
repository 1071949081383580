package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.textutil.TextHash

/** CCNet-style language-model quality scoring: train a small add-one
  * smoothed bigram LM on a REFERENCE corpus (in CCNet, Wikipedia;
  * here any DataFrame — typically a sample), broadcast it, and score
  * every document by mean token log-probability. Low (very negative)
  * scores flag gibberish, boilerplate, and out-of-domain text; the
  * standard pipeline buckets documents by perplexity and keeps or
  * re-weights buckets.
  *
  * Scale shape: training is two hash aggregations over the reference
  * corpus (token counts, bigram counts over the kept vocabulary),
  * collected to a model bounded by `vocabSize` + observed bigrams —
  * the reference corpus is small BY DESIGN (that is the CCNet
  * construction), so the model broadcasts in MBs. Scoring is a pure
  * per-row map over the 100 TB corpus: tokenize, two hash lookups per
  * token, no shuffle, no join.
  *
  * Model: p(b|a) = (c(a,b) + 1) / (c(a·) + V) with V = |vocab| + 1
  * (the +1 is the OOV bucket); tokens outside the top-`vocabSize`
  * unigrams map to OOV. Documents with < 2 tokens score null.
  */
object LmQuality {

  /** Broadcast-friendly bigram LM: vocabulary index, per-context
    * totals, and bigram counts keyed by (ctxId << 32) | tokId.
    */
  final case class BigramLm(
      vocab: Map[String, Int],
      contextTotals: Map[Int, Long],
      bigrams: Map[Long, Long],
  ) {
    val v: Int = vocab.size + 1 // +1 = OOV bucket
    private val oov: Int = vocab.size
    @inline def id(tok: String): Int = vocab.getOrElse(tok, oov)

    /** mean ln p over the document's bigrams; NaN markers avoided by
      * returning None for < 2 tokens.
      */
    def avgLogProb(text: String): Option[Double] = {
      if (text == null) return None
      val toks = TextHash.tokenize(text)
      if (toks.length < 2) return None
      var sum = 0.0
      var i = 1
      var prev = id(toks(0))
      while (i < toks.length) {
        val cur = id(toks(i))
        val c = bigrams.getOrElse((prev.toLong << 32) | (cur.toLong & 0xffffffffL), 0L)
        val ctx = contextTotals.getOrElse(prev, 0L)
        sum += math.log((c + 1).toDouble / (ctx + v).toDouble)
        prev = cur
        i += 1
      }
      Some(sum / (toks.length - 1))
    }
  }

  /** Train on `ref` (the reference corpus). Vocabulary = top
    * `vocabSize` tokens by frequency, ties broken by token for
    * determinism.
    *
    * The driver never sees the raw bigram stream: counting is one
    * distributed hash aggregation (map-side partials combine the
    * token-stream-sized input down to distinct bigrams), and what is
    * COLLECTED is bounded twice — bigrams below `minCount` are pruned
    * (add-one smoothing absorbs them: a dropped count-1 bigram scores
    * (0+1)/(ctx+V) instead of (1+1)/(ctx+V)), and a `maxBigrams` hard
    * cap keeps the frequency head (count desc, key asc — deterministic)
    * even on a reference corpus whose distinct-bigram count grows
    * toward vocab². Context totals `c(a·)` are computed from the FULL
    * unpruned aggregate (one ≤V+1-row follow-up aggregation), so
    * pruning never skews the denominator.
    */
  def train(
      ref: DataFrame,
      textCol: String,
      vocabSize: Int = 50000,
      minCount: Long = 1L,
      maxBigrams: Int = 2000000,
  ): BigramLm = {
    val spark = ref.sparkSession
    import spark.implicits._
    // both passes (vocabulary, bigrams) read the tokenized reference —
    // persist the narrow text projection so an upstream filter/redact
    // pipeline executes once, not twice
    val text = ref.select(col(textCol).as("t")).as[String].persist()
    val toks = text.flatMap(t => TextHash.tokenize(if (t == null) "" else t))
    val vocab = toks
      .groupByKey(identity)
      .count()
      .toDF("tok", "n")
      .orderBy(col("n").desc, col("tok"))
      .limit(vocabSize)
      .select("tok")
      .as[String]
      .collect()
      .zipWithIndex
      .toMap
    val bcVocab = spark.sparkContext.broadcast(vocab)
    val oovId = vocab.size
    val pairs = text
      .flatMap { t =>
        val v = bcVocab.value
        val ts = TextHash.tokenize(if (t == null) "" else t)
        (1 until ts.length).iterator.map { i =>
          val a = v.getOrElse(ts(i - 1), oovId)
          val b = v.getOrElse(ts(i), oovId)
          (a.toLong << 32) | (b.toLong & 0xffffffffL)
        }
      }
    // distinct-bigram counts stay distributed; only the bounded head
    // and the ≤V+1-row context summary ever reach the driver
    val counted = pairs.toDF("k").groupBy("k").agg(count(lit(1)).as("c")).persist()
    val contexts = counted
      .groupBy(shiftright(col("k"), 32).cast("int").as("ctx"))
      .agg(sum(col("c")).as("n"))
      .as[(Int, Long)]
      .collect()
      .toMap
    // global sort only when the cap actually binds — the common case
    // (pruned set fits) collects straight off the persisted aggregate
    val pruned = counted.where(col("c") >= minCount)
    val head =
      if (pruned.count() <= maxBigrams) pruned
      else pruned.orderBy(col("c").desc, col("k")).limit(maxBigrams)
    val bigrams = head.as[(Long, Long)].collect().toMap
    counted.unpersist(blocking = false)
    text.unpersist(blocking = false)
    bcVocab.destroy()
    BigramLm(vocab, contexts, bigrams)
  }

  /** Score `df`: adds `avg_logprob` (mean ln p per bigram; null for
    * docs with < 2 tokens) and `perplexity` (= exp(-avg_logprob)).
    */
  def score(
      df: DataFrame,
      textCol: String,
      model: BigramLm,
      outCol: String = "avg_logprob",
  ): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    val scoreUdf = udf { (t: String) => bc.value.avgLogProb(t) }
    df.withColumn(outCol, scoreUdf(col(textCol)))
      .withColumn("perplexity", exp(-col(outCol)))
  }
}
