package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** One-call pre-training corpus preparation — the composition an LLM
  * data pipeline actually runs, every stage an operator from this
  * library, in the canonical order:
  *
  *   1. language filter (existing label column, or the heuristic
  *      language ID when none is given)
  *   2. quality filter (composite score ≥ `minQuality`)
  *   3. PII redaction (emails/IPs/phone runs → typed placeholders)
  *   4. exact dedup (content hash, keep min-id)
  *   5. MinHash near-dup removal (canonical member per group;
  *      `transitive` closes a~b~c chains via connected components)
  *   6. context-window chunking (`window`/`stride` token segments)
  *
  * Order is load-bearing: redaction runs BEFORE dedup so documents
  * differing only in contact details collapse; filters run first so
  * the expensive near-dup join never sees rows that were going to be
  * dropped anyway. Scale shape: stages 1-3 are shuffle-free scans,
  * 4-5 are the skew-capped dedup machinery, 6 is an explicit
  * posexplode — nothing here collects to the driver.
  *
  * Output: (id, chunk_idx, chunk_text, n_chunk_tokens).
  */
object CorpusPipeline {

  def prepare(
      df: DataFrame,
      idCol: String,
      textCol: String,
      langs: Seq[String] = Seq("en"),
      langCol: Option[String] = None,
      minQuality: Double = 0.3,
      jaccardThreshold: Double = 0.8,
      transitive: Boolean = true,
      window: Int = 512,
      stride: Int = 512,
  ): DataFrame = {
    val lang: Column = langCol.map(col).getOrElse(TextAnalysis.langIdUdf(col(textCol)))
    val filtered = TextAnalysis
      .qualityScore(df, textCol)
      .where(lang.isInCollection(langs) && col("quality_score") >= minQuality)
      .select(df.columns.map(col): _*)
    val redacted = TextAnalysis
      .redactPii(filtered, textCol)
      .withColumn(textCol, col("redacted"))
      .drop("redacted", "pii_found")
    val deduped = Dedup.cleanCorpus(redacted, idCol, textCol, jaccardThreshold, transitive)
    TextAnalysis.chunkTokens(deduped, idCol, textCol, window, stride)
  }

  /** [[prepare]] continued to the training-ready layout: chunks get a
    * seeded deterministic global shuffle position ([[Packing
    * .deterministicShuffle]] — reproducible epoch order, no
    * single-partition window), then the packed-sequence layout at
    * `seqLen` tokens in that order ([[Packing.sequencePackingByCount]]
    * over the chunk token counts). Output: one row per surviving
    * chunk — (chunk_id, id, chunk_idx, chunk_text, n_chunk_tokens,
    * pos, start_offset, pack_first, pack_last); `pack_first/last` are
    * the training-sequence ids the chunk occupies.
    */
  def prepareSequences(
      df: DataFrame,
      idCol: String,
      textCol: String,
      seqLen: Int = 512,
      shuffleSalt: String = "epoch0",
      langs: Seq[String] = Seq("en"),
      langCol: Option[String] = None,
      minQuality: Double = 0.3,
      jaccardThreshold: Double = 0.8,
  ): DataFrame = {
    val chunks = prepare(
      df, idCol, textCol, langs, langCol, minQuality, jaccardThreshold,
      transitive = true, window = seqLen, stride = seqLen)
      .withColumn("chunk_id", concat(col(idCol).cast("string"), lit("#"), col("chunk_idx")))
      .persist()
    val layout =
      Packing.shuffleAndPack(chunks, "chunk_id", "n_chunk_tokens", seqLen, shuffleSalt)
    // localCheckpoint, not persist: corpus-sized frame handed to the
    // caller — no CacheManager entry to leak; layout is already
    // checkpoint-backed (shuffleAndPack), chunks released here
    val out = chunks
      .join(
        layout.select(
          col("chunk_id"), col("pos"), col("start_offset"),
          col("pack_first"), col("pack_last")),
        "chunk_id")
      .localCheckpoint(true)
    chunks.unpersist(blocking = false)
    out
  }
}
