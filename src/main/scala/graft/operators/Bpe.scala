package graft.operators

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

import graft.textutil.TextHash

/** Byte-pair-encoding tokenizer (Sennrich et al. ACL'16): learn merge
  * rules from corpus word frequencies, encode text as subword tokens.
  * The real thing a pre-training pipeline runs between text cleaning
  * and sequence packing — [[TextAnalysis.tokenVocabulary]] counts
  * whole words; this learns the subword vocabulary.
  *
  * Scale shape mirrors the k-means/IVF family: TRAINING is driver-side
  * over a bounded reservoir sample (word-frequency BPE only needs the
  * frequency head to recover the merges that matter; the sample bound
  * makes that a constant-size problem regardless of corpus size),
  * ENCODING is an embarrassingly parallel scan with the ranked merge
  * table broadcast (a few hundred KB) and a per-executor word cache —
  * Zipf's law makes the hit rate high, so the greedy merge loop runs
  * roughly once per DISTINCT word per executor, not once per token.
  */
object Bpe {

  /** Ranked merge rules; earlier = higher priority. The end-of-word
    * marker `</w>` is a separate trailing symbol, so merges can learn
    * word-final units ("ing" + "</w>").
    */
  final case class BpeModel(merges: Array[(String, String)]) {
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
  }

  val EndOfWord = "</w>"

  /** Learn `numMerges` merge rules from a reservoir sample of
    * documents (word frequencies from the ASCII-word tokenizer all
    * oracle-checked text stats use). Deterministic: ties on pair
    * frequency break lexicographically.
    */
  def train(
      df: DataFrame,
      textCol: String,
      numMerges: Int = 200,
      sampleRows: Int = 10000,
      seed: Long = 42L,
  ): BpeModel = {
    val texts = sampleTexts(df, textCol, sampleRows, seed)
    val wordFreq = new scala.collection.mutable.HashMap[String, Long]()
    texts.foreach { t =>
      TextHash.tokenize(t).foreach { w =>
        wordFreq.update(w, wordFreq.getOrElse(w, 0L) + 1L)
      }
    }
    // each word as its symbol sequence (chars + EOW), carried with freq
    var words: Array[(Array[String], Long)] = wordFreq.toArray.map { case (w, f) =>
      (w.map(_.toString).toArray :+ EndOfWord, f)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var step = 0
    var done = false
    while (step < numMerges && !done) {
      val pairCounts = new scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        // max frequency, deterministic lexicographic tie-break
        val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        words = words.map { case (syms, f) =>
          if (syms.length < 2) (syms, f)
          else {
            val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
                out += joined
                i += 2
              } else {
                out += syms(i)
                i += 1
              }
            }
            (out.toArray, f)
          }
        }
        step += 1
      }
    }
    BpeModel(merges.toArray)
  }

  /** Greedy BPE encoding of one word (chars+EOW, repeatedly merge the
    * lowest-rank adjacent pair). Standard algorithm; deterministic.
    */
  private[graft] def encodeWord(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms: Vector[String] = word.map(_.toString).toVector :+ EndOfWord
    var continue = true
    while (continue && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) continue = false
      else {
        val joined = syms(bestIdx) + syms(bestIdx + 1)
        syms = (syms.take(bestIdx) :+ joined) ++ syms.drop(bestIdx + 2)
      }
    }
    syms.toArray
  }

  /** Subword-encoding UDF: text → token array. The merge table rides
    * the closure (a few hundred KB — plain task broadcast); encoded
    * words memoize in a bounded per-executor cache.
    */
  def encodeUdf(model: BpeModel): UserDefinedFunction = {
    val merges = model.merges
    udf { (text: String) =>
      if (text == null) Array.empty[String]
      else {
        val (fp, ranks) = BpeEncoderCache.ranksFor(merges)
        val cache = BpeEncoderCache.wordCache
        TextHash.tokenize(text).flatMap { w =>
          val key = (fp, w)
          var enc = cache.get(key)
          if (enc == null) {
            enc = encodeWord(w, ranks)
            if (cache.size < 200000) cache.put(key, enc)
          }
          enc
        }
      }
    }
  }

  /** df + (bpe_tokens, n_bpe_tokens) columns. */
  def withBpeTokens(df: DataFrame, textCol: String, model: BpeModel): DataFrame = {
    val enc = encodeUdf(model)
    df.withColumn("bpe_tokens", enc(col(textCol)))
      .withColumn("n_bpe_tokens", size(col("bpe_tokens")))
  }

  /** Reservoir sample of a text column (Algorithm R per partition —
    * same shape as the vector sampler in [[Similarity]]).
    */
  private def sampleTexts(
      df: DataFrame,
      textCol: String,
      sampleRows: Int,
      seed: Long,
  ): Array[String] = {
    val projected = df.select(col(textCol)).na.drop()
    val numPart = math.max(1, projected.rdd.getNumPartitions)
    val perPartition = math.max(1, sampleRows / numPart)
    projected.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val rng = new scala.util.Random(seed ^ (pid.toLong * 0x9e3779b97f4a7c15L))
        val res = new scala.collection.mutable.ArrayBuffer[String](
          math.min(perPartition, 1024))
        var seen = 0L
        it.foreach { row =>
          val t = row.getString(0)
          if (res.length < perPartition) res += t
          else {
            val j = (rng.nextLong() & Long.MaxValue) % (seen + 1)
            if (j < perPartition) res(j.toInt) = t
          }
          seen += 1
        }
        res.iterator
      }
      .collect()
  }
}

/** Executor-local memo state for the BPE encoder UDF. Every cache is
  * keyed by a FULL-content fingerprint of the merge table (FNV-1a over
  * every pair, not a head/last sketch), so two models that happen to
  * share length + first + last merge can never collide, and concurrent
  * jobs running DIFFERENT models on one executor each hit their own
  * entries — no clear()-on-switch, hence no check-then-act race
  * repopulating a cleared cache with stale entries.
  */
private[operators] object BpeEncoderCache {
  /** (model fingerprint, word) → encoded symbols; bounded globally. */
  val wordCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, String), Array[String]]()
  private val ranksCache =
    new java.util.concurrent.ConcurrentHashMap[java.lang.Long, Map[(String, String), Int]]()

  /** FNV-1a over every merge pair, with a separator mix per symbol so
    * ("ab","c") and ("a","bc") hash differently. Content fingerprint,
    * NOT identity — every task deserializes its own closure copy of
    * the merge array, so identity would rebuild per task.
    */
  private[operators] def fingerprint(merges: Array[(String, String)]): Long = {
    var h = 0xcbf29ce484222325L
    def mix(s: String): Unit = {
      var i = 0
      while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
      h ^= 0x1fL
      h *= 0x100000001b3L
    }
    merges.foreach { case (a, b) => mix(a); mix(b) }
    h
  }

  def ranksFor(merges: Array[(String, String)]): (Long, Map[(String, String), Int]) = {
    // long-lived executors across many retrains: bound the model count
    if (ranksCache.size > 8) { ranksCache.clear(); wordCache.clear() }
    val fp = fingerprint(merges)
    (fp, ranksCache.computeIfAbsent(fp, _ => merges.zipWithIndex.toMap))
  }
}
