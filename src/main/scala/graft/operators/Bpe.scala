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
    * words memoize in a bounded per-model, per-executor cache. Per-row
    * cost of model resolution is a single reference compare (see
    * [[BpeEncoderCache]]) — the full merge-table fingerprint is hashed
    * once per task, not once per row.
    */
  def encodeUdf(model: BpeModel): UserDefinedFunction = {
    val merges = model.merges
    udf { (text: String) =>
      if (text == null) Array.empty[String]
      else {
        val entry = BpeEncoderCache.entryFor(merges)
        TextHash.tokenize(text).flatMap(entry.encode)
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

/** Executor-local memo state for the BPE encoder UDF.
  *
  * Models are identified by a FULL-content fingerprint of the merge
  * table (FNV-1a over every pair, not a head/last sketch), so two
  * models that happen to share length + first + last merge can never
  * collide. The fingerprint is only COMPUTED once per task, though: a
  * single-slot thread-local memo keyed on the merge-array REFERENCE
  * resolves the model with one `eq` compare per row (the UDF closure
  * deserializes once per task, so the reference is stable across all
  * rows a task encodes — a fresh task pays one fingerprint hash, not
  * one per row).
  *
  * Each model owns its own bounded word cache, so concurrent jobs
  * running DIFFERENT models on one executor never evict or starve
  * each other; the model table itself is a small access-order LRU —
  * a long-lived executor that sees many retrains drops the
  * least-recently-used model (and its word cache) one at a time
  * instead of clear-all thrash.
  */
private[operators] object BpeEncoderCache {
  private val MaxModels = 8
  private val MaxWordsPerModel = 50000

  /** One resolved model: ranked merges + its private word memo. */
  private[operators] final class Entry(val fp: Long, val ranks: Map[(String, String), Int]) {
    private val wordCache =
      new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
    private[operators] def cachedWords: Int = wordCache.size
    def encode(w: String): Array[String] = {
      var enc = wordCache.get(w)
      if (enc == null) {
        enc = Bpe.encodeWord(w, ranks)
        // Zipf makes the frequency head carry the hit rate; past the
        // cap new rare words just encode uncached — no eviction scan.
        if (wordCache.size < MaxWordsPerModel) wordCache.put(w, enc)
      }
      enc
    }
  }

  /** FNV-1a over every merge pair, with a separator mix per symbol so
    * ("ab","c") and ("a","bc") hash differently.
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

  // access-order LRU over models; `synchronized` is fine — touched
  // once per (task, model), never per row
  private val models =
    new java.util.LinkedHashMap[java.lang.Long, Entry](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[java.lang.Long, Entry]): Boolean =
        size() > MaxModels
    }

  private val slot = new ThreadLocal[(Array[(String, String)], Entry)]

  def entryFor(merges: Array[(String, String)]): Entry = {
    val memo = slot.get()
    if (memo != null && (memo._1 eq merges)) memo._2
    else {
      val fp = java.lang.Long.valueOf(fingerprint(merges))
      val e = models.synchronized {
        var cur = models.get(fp)
        if (cur == null) {
          cur = new Entry(fp, merges.zipWithIndex.toMap)
          models.put(fp, cur)
        }
        cur
      }
      slot.set((merges, e))
      e
    }
  }
}
