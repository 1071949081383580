package graft.operators

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.unsafe.types.UTF8String

/** Data Selection via Importance Resampling (DSIR; Xie et al.,
  * NeurIPS 2023): pick the k raw-corpus documents that look most like
  * a small TARGET corpus, where "look like" is an importance weight
  * under hashed bag-of-n-gram unigram models:
  *
  *   log w(doc) = Σ_features count_b(doc) · (log p̂_target(b) − log p̂_raw(b))
  *
  * Features are word unigrams + bigrams hashed into `buckets` slots
  * (the paper's recipe — hashing makes the model a fixed-size array
  * instead of an open vocabulary). Selection is top-k by
  * `log w + scale·Gumbel`, the Gumbel-top-k trick: scale=0 is
  * deterministic argmax selection, scale=1 samples WITHOUT
  * replacement from the softmax of the weights — reproducibly,
  * because the Gumbel noise is seeded per-document id, not drawn
  * from RNG state.
  *
  * Scale shapes (100 TB):
  *   - fitting is ONE scan per corpus: per-partition count arrays
  *     (8·buckets bytes), `treeReduce`-summed — the corpus text never
  *     shuffles, and the "model" that comes back to the driver is a
  *     fixed-size array regardless of corpus size.
  *   - scoring is a broadcast-array lookup per token — a pure
  *     projection, shuffle-free, streams at scan speed.
  *   - selection is top-k (TakeOrderedAndProject): per-partition
  *     bounded heaps, k rows to the driver-side final heap, no global
  *     sort. For corpus-sized k, switch to a threshold on
  *     `importanceWeights` output instead (documented trade: one
  *     extra pass to calibrate the threshold quantile).
  */
object Dsir {

  /** The tokenizer every DSIR face shares: lowercase, split on
    * non-word runs — the same convention the text-analysis operators
    * use, so bucket counts line up with their token counts.
    */
  private[graft] def tokens(text: String): Array[String] =
    if (text == null) Array.empty[String]
    else graft.textutil.TextHash.tokenize(text)

  /** Visit the hashed feature bucket of every unigram and bigram in
    * `text` — shared by fitting and scoring so the two can never
    * disagree on featurization. Seeded 32-bit murmur, matching the
    * CMS bucketing convention.
    */
  private[graft] def foreachBucket(text: String, buckets: Int, seed: Int)(f: Int => Unit): Unit = {
    val ts = tokens(text)
    var i = 0
    while (i < ts.length) {
      f(math.floorMod(scala.util.hashing.MurmurHash3.stringHash(ts(i), seed), buckets))
      if (i + 1 < ts.length) {
        val bigram = ts(i) + " " + ts(i + 1)
        f(math.floorMod(scala.util.hashing.MurmurHash3.stringHash(bigram, seed), buckets))
      }
      i += 1
    }
  }

  /** Hashed-feature counts of a whole corpus in ONE scan: arrays
    * allocated INSIDE each partition (an 8·buckets-byte treeAggregate
    * zero would ride in every task binary — same discipline as
    * [[Sketches.countMinSketch]]), summed by `treeReduce`. Returns
    * (bucketCounts, totalFeatureCount).
    */
  def fitBucketCounts(
      df: DataFrame,
      textCol: String,
      buckets: Int,
      seed: Int = 7,
  ): (Array[Long], Long) = {
    require(buckets > 0)
    val rdd = df.select(col(textCol).cast("string")).rdd
    if (rdd.getNumPartitions == 0) return (new Array[Long](buckets), 0L)
    val counts = rdd
      .mapPartitions { it =>
        val c = new Array[Long](buckets)
        it.foreach { row =>
          if (!row.isNullAt(0)) foreachBucket(row.getString(0), buckets, seed)(b => c(b) += 1)
        }
        Iterator.single(c)
      }
      .treeReduce { (a, b) =>
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
    (counts, counts.sum)
  }

  /** A fitted importance model: `logRatio(b)` = smoothed
    * log p̂_target(b) − log p̂_raw(b). Fixed-size, broadcastable,
    * independent of both corpus sizes.
    */
  final case class DsirModel(
      buckets: Int,
      seed: Int,
      alpha: Double,
      logRatio: Array[Double],
  ) {
    /** Deterministic per-document log importance weight: sequential
      * sum over the document's features (fixed order ⇒ bit-stable).
      */
    def logWeight(text: String): Double = {
      var s = 0.0
      foreachBucket(text, buckets, seed)(b => s += logRatio(b))
      s
    }
  }

  /** Fit target and raw hashed-unigram models and freeze their log
    * ratio. Laplace smoothing `alpha` keeps never-seen buckets finite
    * on BOTH sides (a bucket unseen in target scores
    * log α − log(count_raw + α) ≪ 0 — the push away from
    * raw-only vocabulary that makes selection work). The default is
    * LIGHT (0.01, not the classic 1.0) deliberately: smoothing adds
    * α·buckets pseudo-features to each corpus total, and with 2^16
    * buckets α=1 hands a small target corpus more pseudo-mass than
    * real mass — normalizers skew and the log-ratio signal washes
    * out. At corpus scale real counts dwarf α·buckets and the choice
    * stops mattering.
    */
  def fit(
      target: DataFrame,
      raw: DataFrame,
      textCol: String,
      buckets: Int = 1 << 16,
      alpha: Double = 0.01,
      seed: Int = 7,
  ): DsirModel = {
    require(alpha > 0, s"alpha must be > 0: $alpha")
    val (tc, tn) = fitBucketCounts(target, textCol, buckets, seed)
    val (rc, rn) = fitBucketCounts(raw, textCol, buckets, seed)
    val tDen = math.log(tn.toDouble + alpha * buckets)
    val rDen = math.log(rn.toDouble + alpha * buckets)
    val ratio = new Array[Double](buckets)
    var b = 0
    while (b < buckets) {
      ratio(b) = (math.log(tc(b) + alpha) - tDen) - (math.log(rc(b) + alpha) - rDen)
      b += 1
    }
    DsirModel(buckets, seed, alpha, ratio)
  }

  /** Add a `log_weight` column — broadcast ratio array, one pass over
    * each document's tokens, no shuffle.
    */
  def importanceWeights(df: DataFrame, textCol: String, model: DsirModel): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val w = udf { (text: String) => bc.value.logWeight(text) }
    df.withColumn("log_weight", w(col(textCol).cast("string")))
  }

  /** Seeded standard Gumbel noise for a document id: u ∈ (0, 1) from
    * the top 53 bits of XXH64(id, seed), g = −ln(−ln u). Pure
    * function of (id, seed) — reruns and repartitions can't change
    * the sample.
    */
  private[graft] def gumbel(id: String, seed: Long): Double = {
    // a NULL id still needs SOME deterministic noise (Spark hands the
    // UDF a null reference; hashing it would NPE the whole job)
    val h = XXH64.hashUTF8String(UTF8String.fromString(if (id == null) "" else id), seed)
    val u = ((h >>> 11) + 0.5) / (1L << 53).toDouble
    -math.log(-math.log(u))
  }

  /** Select `k` documents by importance: top-k of
    * `log_weight + gumbelScale · Gumbel(idCol)`. `gumbelScale = 0`
    * (default) is deterministic highest-weight selection;
    * `gumbelScale = 1` is the paper's Gumbel-top-k sampling without
    * replacement. Output carries `log_weight` and `score`; ties break
    * on the id so the row set is total-order stable.
    */
  def select(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      model: DsirModel,
      gumbelScale: Double = 0.0,
      seed: Long = 42L,
  ): DataFrame = {
    require(k > 0, s"k must be > 0: $k")
    val weighted = importanceWeights(df, textCol, model)
    val scored =
      if (gumbelScale == 0.0) weighted.withColumn("score", col("log_weight"))
      else {
        val g = udf { (id: String) => gumbel(id, seed) }
        weighted.withColumn(
          "score",
          col("log_weight") + lit(gumbelScale) * g(col(idCol).cast("string")),
        )
      }
    scored.orderBy(col("score").desc, col(idCol)).limit(k)
  }
}
