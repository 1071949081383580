package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.{DataFrame, Encoders, Row}

import graft.operators.TextAnalysis

/** Streaming face of [[graft.operators.CorpusPipeline.webIngest]]'s
  * ingest front end: the firehose path a crawler feeds continuously,
  * where the batch pipeline's corpus-wide stages are replaced by their
  * bounded-state streaming counterparts.
  *
  * Stage mapping (batch → stream):
  *   - HTML extract / URL parts / langId / per-language Gopher: pure
  *     per-row projections — identical code, streams as-is.
  *   - corpus-wide line dedup → IN-DOCUMENT line dedup (stateless;
  *     the corpus-wide pass needs corpus-wide line frequencies, which
  *     is the standing-corpus batch job's business).
  *   - exact dedup → [[EventStreams.dedupStream]] (fingerprint state
  *     within the watermark horizon; older duplicates are
  *     [[graft.operators.Dedup.newDocsOnly]]'s Bloom path against the
  *     standing corpus).
  *   - per-host cap → [[capPerHostStream]]: first-arrival counting
  *     state, one long per host.
  *   - near-dup banding / packed layout: inherently corpus-wide —
  *     run them in the periodic batch compaction over this stream's
  *     landed output (the lambda shape every production web pipeline
  *     uses).
  *
  * Works on a bounded batch frame too (every stage picks its
  * deterministic batch evaluator), which is what the stream≡batch
  * spec leans on.
  */
object StreamingWebIngest {

  /** Crawl-record input shape for typed MemoryStream sources/tests. */
  final case class WebDoc(doc_id: Long, ts: Timestamp, html: String, url: String)

  /** First-arrival per-host cap — the streaming counterpart of
    * [[graft.operators.Sampling.capPerStratum]]. Streaming keeps ONE
    * counter per host (`flatMapGroupsWithState`, processing-time
    * timeout optional at the caller's sink horizon — dropped here
    * because the state is 16 bytes per distinct host, bounded by host
    * cardinality, not ingest volume); a row passes while its host's
    * count ≤ max. Batch mode is the deterministic equivalent:
    * row_number over (host, event-time, id) ≤ max — first-arrival
    * when input order follows event time, which is also exactly what
    * the stream emits when fed in event-time order.
    *
    * The batch face's md5-order cap stays the REPRODUCIBLE sampling
    * tool (stable under corpus growth); first-arrival is the right
    * semantics on a firehose, where "the first N pages we crawled
    * from this host" is the budget being enforced.
    */
  def capPerHostStream(
      docs: DataFrame,
      idCol: String,
      tsCol: String,
      hostCol: String,
      maxPerHost: Int,
  ): DataFrame = {
    require(maxPerHost > 0, s"maxPerHost must be > 0: $maxPerHost")
    // null event time = no first-arrival position: batch would sort it
    // ahead of every real row and hand it a cap slot; drop in both
    // modes so the fMGWS, TWS, and batch faces agree on dirty inputs
    val live = docs.where(col(tsCol).isNotNull)
    if (!docs.isStreaming) {
      live
        .withColumn(
          "__rn",
          row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col(hostCol))
              .orderBy(col(tsCol), col(idCol))))
        .where(col("__rn") <= maxPerHost)
        .drop("__rn")
    } else {
      // generic over the input schema: rows pass through whole
      // (Encoders.row keeps every column), state is one Long per host.
      // NULL hosts key on "\u0000" (no real hostname contains NUL), so
      // they form their OWN capped group exactly like batch mode's
      // NULL window partition — String.valueOf would fold them into a
      // literal "null" host.
      val hostIdx = docs.schema.fieldIndex(hostCol)
      val rowEnc = org.apache.spark.sql.Encoders.row(docs.schema)
      val grouped = live.groupByKey(
        (r: org.apache.spark.sql.Row) =>
          if (r.isNullAt(hostIdx)) "\u0000" else String.valueOf(r.get(hostIdx)))(
        org.apache.spark.sql.Encoders.STRING)
      grouped.flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (_: String, rows: Iterator[org.apache.spark.sql.Row], state: GroupState[Long]) => {
          var n = state.getOption.getOrElse(0L)
          val kept = rows.filter { _ =>
            if (n < maxPerHost) { n += 1; true } else false
          }.toList
          state.update(n)
          kept.iterator
        })(org.apache.spark.sql.Encoders.scalaLong, rowEnc)
    }
  }

  /** [[capPerHostStream]] under `transformWithState` — identical
    * first-arrival semantics (the [[BudgetProcessor]] budget keyed by
    * host, (event-time, id) order within a trigger), but CHAINABLE:
    * the stage re-declares its event-time column, so further stateful
    * operators can plan upstream or downstream of it in one query —
    * the property the fMGWS variant structurally lacks. Batch mode is
    * the same deterministic window as [[capPerHostStream]]. Requires
    * the RocksDB state store provider when streaming; keep the fMGWS
    * face for state stores without `transformWithState`.
    */
  def capPerHostStreamTws(
      docs: DataFrame,
      idCol: String,
      tsCol: String,
      hostCol: String,
      maxPerHost: Int,
      watermarkDelay: String = "10 minutes",
  ): DataFrame = {
    require(maxPerHost > 0, s"maxPerHost must be > 0: $maxPerHost")
    if (!docs.isStreaming) capPerHostStream(docs, idCol, tsCol, hostCol, maxPerHost)
    else {
      val hostIdx = docs.schema.fieldIndex(hostCol)
      val tsIdx = docs.schema.fieldIndex(tsCol)
      val idIdx = docs.schema.fieldIndex(idCol)
      val rowEnc = Encoders.row(org.apache.spark.sql.types.StructType(docs.schema.fields))
      StreamingDedup
        .ensureWatermark(docs, tsCol, watermarkDelay)
        .groupByKey((r: Row) =>
          if (r.isNullAt(hostIdx)) "\u0000" else String.valueOf(r.get(hostIdx)))(
          Encoders.STRING)
        .transformWithState(
          new BudgetProcessor(maxPerHost.toLong, 0L, tsIdx, idIdx),
          tsCol, OutputMode.Append())(rowEnc)
    }
  }

  /** The composed stream: (id, ts, html, url) → cleaned, deduped,
    * host-capped document rows (id, ts, text, url_norm, url_host,
    * lang_pred). Append-mode safe: every stateful stage is
    * watermark-bounded or counter-bounded.
    */
  def webIngestStream(
      docs: DataFrame,
      idCol: String,
      tsCol: String,
      htmlCol: String,
      urlCol: String,
      langs: Seq[String] = Seq.empty,
      maxPerHost: Int = 100000,
      dedupWatermark: String = "10 minutes",
      blocklist: Option[DataFrame] = None,
      canonicalizeNfc: Boolean = false,
      c4: Boolean = false,
      soft404: Boolean = false,
      redactPii: Boolean = false,
      mainContent: Boolean = false,
      stripTracking: Boolean = false,
      paragraphBreaks: Boolean = false,
      paragraphDedup: Boolean = false,
      minParagraphChars: Int = 5,
      minLineChars: Int = 5,
  ): DataFrame = {
    val lined = cleanedFrontEnd(
      docs, idCol, tsCol, htmlCol, urlCol, langs, blocklist, canonicalizeNfc, c4,
      soft404, redactPii, mainContent, stripTracking, paragraphBreaks, paragraphDedup,
      minParagraphChars, minLineChars)
    val deduped = EventStreams
      .dedupStream(lined, "ts", "text", dedupWatermark)
      .drop("content_fp")
    capPerHostStream(deduped, "id", "ts", "url_host", maxPerHost)
  }

  /** [[webIngestStream]] ported to `transformWithState` — the SAME
    * stage list and semantics (cleaned front end → exact dedup →
    * per-host cap; no near-dup stage), with both stateful stages as
    * chained TWS operators ([[EventStreams.dedupStreamTws]],
    * [[capPerHostStreamTws]]) in ONE streaming query. Because every
    * stage re-declares its event-time column, callers can chain
    * FURTHER stateful operators downstream (windowed aggregations,
    * [[StreamingDedup.nearDupSuppress]]) without the sink-side
    * compaction step the fMGWS face needs — that face stays for
    * state stores without `transformWithState` support.
    */
  def webIngestStreamTws(
      docs: DataFrame,
      idCol: String,
      tsCol: String,
      htmlCol: String,
      urlCol: String,
      langs: Seq[String] = Seq.empty,
      maxPerHost: Int = 100000,
      dedupWatermark: String = "10 minutes",
      blocklist: Option[DataFrame] = None,
      canonicalizeNfc: Boolean = false,
      c4: Boolean = false,
      soft404: Boolean = false,
      redactPii: Boolean = false,
      mainContent: Boolean = false,
      stripTracking: Boolean = false,
      paragraphBreaks: Boolean = false,
      paragraphDedup: Boolean = false,
      minParagraphChars: Int = 5,
      minLineChars: Int = 5,
  ): DataFrame = {
    val lined = cleanedFrontEnd(
      docs, idCol, tsCol, htmlCol, urlCol, langs, blocklist, canonicalizeNfc, c4,
      soft404, redactPii, mainContent, stripTracking, paragraphBreaks, paragraphDedup,
      minParagraphChars, minLineChars)
    val deduped = EventStreams
      .dedupStreamTws(lined, "id", "ts", "text", dedupWatermark)
      .drop("content_fp")
    capPerHostStreamTws(deduped, "id", "ts", "url_host", maxPerHost, dedupWatermark)
  }

  /** The STATELESS stages of the ingest — LITERALLY the batch face's
    * [[graft.operators.CorpusPipeline.cleanedCrawlPrefix]] (one
    * function, so the stage list and option positions can never
    * diverge between batch and stream; every stage in it is a per-row
    * projection/filter or a stream-safe static join), plus the
    * in-doc line dedup that replaces the batch path's corpus-wide
    * pass. Shared so the near-dup side stream can branch before any
    * stateful operator (Spark supports only specific chains of
    * stateful operators in one streaming query; branching here keeps
    * each output query single-stateful).
    */
  private def cleanedFrontEnd(
      docs: DataFrame,
      idCol: String,
      tsCol: String,
      htmlCol: String,
      urlCol: String,
      langs: Seq[String],
      blocklist: Option[DataFrame],
      canonicalizeNfc: Boolean,
      c4: Boolean,
      soft404: Boolean,
      redactPii: Boolean,
      mainContent: Boolean,
      stripTracking: Boolean,
      paragraphBreaks: Boolean = false,
      paragraphDedup: Boolean = false,
      minParagraphChars: Int = 5,
      minLineChars: Int = 5,
  ): DataFrame = {
    val quality = graft.operators.CorpusPipeline.cleanedCrawlPrefix(
      docs, idCol, Some(tsCol), htmlCol, urlCol, langs, blocklist,
      canonicalizeNfc, c4, soft404, redactPii, mainContent, stripTracking,
      paragraphBreaks)
    // minLineChars < 0 SKIPS the line stage entirely — the streaming
    // twin of batch webIngest's Dolma-style paragraph-only config
    // (CorpusPipeline.webIngest, same sentinel; a real skip, not a
    // floored no-op that still pays the per-row pass)
    val lineDeduped =
      if (minLineChars < 0) quality
      else TextAnalysis
        .dedupLinesInDoc(quality, "text", outCol = "text_deduped",
          minLineChars = minLineChars)
        .drop("text")
        .withColumnRenamed("text_deduped", "text")
    // the streaming paragraph stage is the IN-DOC twin (the corpus-
    // wide winner aggregation of the batch operator cannot run in a
    // stream); same relative position as batch webIngest's — after
    // line dedup, before the exact-dedup state
    if (!paragraphDedup) lineDeduped
    else TextAnalysis
      .dedupParagraphsInDoc(lineDeduped, "text", outCol = "text_pd",
        minParagraphChars = minParagraphChars)
      .drop("text")
      .withColumnRenamed("text_pd", "text")
  }

  /** [[webIngestStream]] plus a NEAR-DUP VICTIM side stream: the
    * second output carries `(victim_id, kept_id, est_jaccard, ts)`
    * rows from [[StreamingDedup.nearDupHits]] run over the same
    * cleaned front end — `victim_id` is the later arrival of each
    * colliding pair, the doc a keep-first policy suppresses.
    *
    * Why two streams rather than an in-stream filter: doc-level
    * suppression needs every band verdict of a doc (a stateful
    * aggregation) DOWNSTREAM of the banded collision state, and that
    * chain of arbitrary stateful operators is not a supported
    * streaming plan — while sink-side suppression (anti-join the
    * landed victims in the periodic batch compaction, the lambda
    * shape the scaladoc above describes) is exact, idempotent, and
    * needs no new operator. Both outputs branch from the SAME
    * stateless front end, so each query plan holds exactly one
    * stateful operator chain.
    *
    * A pair colliding in several bands emits one victim row per
    * colliding band; suppression is idempotent under that
    * multiplicity (`distinct` at the sink if row counts matter).
    * Victims are detected pre-exact-dedup and pre-cap, so the victim
    * list may name ids the main stream already dropped — harmless for
    * suppression, and it keeps both queries single-stateful.
    */
  /** Attach named THROUGHPUT METRICS to a curated document frame via
    * Spark's `observe` — the production-monitoring face of
    * [[graft.operators.CorpusPipeline.webIngestFunnel]]: where the
    * funnel is a batch REPORT that runs the pipeline to audit it,
    * this rides the pipeline's own plan at zero extra cost (observed
    * aggregates evaluate inside the existing scan) and surfaces
    * per-microbatch `n_docs` / `n_tokens` / `n_chars` in every
    * `StreamingQueryProgress.observedMetrics` entry (and, on batch
    * frames, through `QueryExecutionListener`). Chain one call per
    * stage boundary with distinct names to watch attrition live:
    *
    *   observeCorpusMetrics(cleaned, "post_quality") → dedup →
    *   observeCorpusMetrics(_, "post_dedup") → sink
    *
    * Observed aggregates must not reference the streaming watermark
    * column and these don't; `observe` imposes no shuffle and no
    * extra pass — Spark folds the aggregation into the stage.
    */
  def observeCorpusMetrics(
      docs: DataFrame,
      name: String,
      textCol: String = "text",
  ): DataFrame =
    docs.observe(
      name,
      count(lit(1)).as("n_docs"),
      coalesce(sum(TextAnalysis.tokenCount(col(textCol)).cast("long")), lit(0L))
        .as("n_tokens"),
      coalesce(sum(length(col(textCol)).cast("long")), lit(0L)).as("n_chars"))

  /** Per-key ADMISSION BUDGET under `transformWithState`: each key
    * admits its first `max` arrivals ((event-time, id) order within a
    * trigger; state order across triggers) and drops the rest — the
    * one mechanism behind both chained stateful stages of
    * [[inlineDedupAndCap]]: exact dedup is budget 1 keyed by content
    * fingerprint (with an event-time GC timer, the
    * dropDuplicatesWithinWatermark horizon), the host cap is budget
    * `maxPerHost` keyed by host (no timer — one long per distinct
    * host, bounded by host cardinality like [[capPerHostStream]]).
    */
  private[streaming] final class BudgetProcessor(
      max: Long, horizonMs: Long, tsIdx: Int, idIdx: Int)
      extends StatefulProcessor[String, Row, Row] {
    @transient private var n: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      n = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(
        key: String, rows: Iterator[Row], tv: TimerValues): Iterator[Row] = {
      val existed = n.exists()
      var c = if (existed) n.get() else 0L
      val sorted = rows.toSeq
        .sortBy(r => (r.getTimestamp(tsIdx).getTime, r.getLong(idIdx)))
      val out = sorted.filter { _ =>
        if (c < max) { c += 1; true } else false
      }
      n.update(c)
      // GC timer armed from the FIRST occurrence only —
      // dropDuplicatesWithinWatermark's retention rule ("duplicates
      // within the delay of the first event"): re-arming on every
      // duplicate would slide the window and suppress arrivals the
      // built-in (and the fMGWS face) would re-admit
      if (horizonMs > 0L && !existed && sorted.nonEmpty)
        StreamingDedup.resetTimer(
          getHandle, sorted.head.getTimestamp(tsIdx).getTime, horizonMs, tv)
      out.iterator
    }
    override def handleExpiredTimer(
        key: String, tv: TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[Row] = {
      n.clear()
      Iterator.empty
    }
  }

  /** The FULLY IN-STREAM curation chain: exact dedup → near-dup
    * SUPPRESSION → per-host cap, composed as FOUR chained stateful
    * operators in ONE streaming query — the shape
    * [[webIngestWithNearDup]]'s scaladoc rules out under
    * `flatMapGroupsWithState` (no stateful chaining), made legal by
    * `transformWithState`'s event-time re-declaration at every stage
    * (each operator names its output event-time column, the watermark
    * propagates, and the next stateful operator plans normally). The
    * emitted stream IS the curated corpus: no victim side stream, no
    * sink-side compaction anti-join.
    *
    * Stage order matches the batch pipeline
    * ([[graft.operators.CorpusPipeline.webIngest]]): exact FIRST, so
    * byte-identical recrawls die on a 16-byte fingerprint state
    * before the 32-band MinHash machinery ever signs them — at
    * firehose scale the exact stage absorbs the bulk of duplicate
    * volume at a fraction of the near-dup stage's state and shuffle.
    *
    * Input: (idCol long, tsCol timestamp, textCol string, hostCol
    * string) + any other columns, all carried through. Works on a
    * bounded batch frame (the same deterministic stage composition:
    * keep-first windows + the [[StreamingDedup.nearDupSuppress]]
    * batch face), which is what the q137 driver gate evaluates; the
    * stream ≡ batch spec pins the two. Streaming requires the
    * RocksDB state store provider.
    */
  def inlineDedupAndCap(
      docs: DataFrame,
      idCol: String,
      tsCol: String,
      textCol: String,
      hostCol: String,
      maxPerHost: Int,
      numHashes: Int = 128,
      bands: Int = 32,
      shingleSize: Int = 3,
      estThreshold: Double = 0.7,
      watermarkDelay: String = "10 minutes",
      horizonMs: Long = 3600L * 1000L,
  ): DataFrame = {
    require(maxPerHost > 0, s"maxPerHost must be > 0: $maxPerHost")
    // horizonMs == 0 would never arm the exact stage's GC timer (the
    // BudgetProcessor gate) — unbounded fingerprint state, duplicates
    // suppressed forever; fail loudly like dedupStreamTws
    require(horizonMs > 0L,
      s"inlineDedupAndCap: dedup horizon must be positive, got ${horizonMs}ms")
    if (!docs.isStreaming) {
      val exactW = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__fp"))
        .orderBy(col(tsCol), col(idCol))
      val exact = docs
        .withColumn("__fp", TextAnalysis.contentFingerprintUdf(col(textCol)))
        .withColumn("__rn", row_number().over(exactW))
        .where(col("__rn") === 1)
        .drop("__fp", "__rn")
      val suppressed = StreamingDedup.nearDupSuppress(
        exact, idCol, tsCol, textCol, numHashes, bands, shingleSize,
        estThreshold, watermarkDelay = watermarkDelay, horizonMs = horizonMs)
      capPerHostStream(suppressed, idCol, tsCol, hostCol, maxPerHost)
    } else {
      val schema = org.apache.spark.sql.types.StructType(docs.schema.fields)
      val tsIdx = docs.schema.fieldIndex(tsCol)
      val idIdx = docs.schema.fieldIndex(idCol)
      val hostIdx = docs.schema.fieldIndex(hostCol)
      val textIdx = docs.schema.fieldIndex(textCol)
      val rowEnc = Encoders.row(schema)
      val exact = StreamingDedup
        .ensureWatermark(docs, tsCol, watermarkDelay)
        .groupByKey((r: Row) => java.lang.Long.toHexString(
          TextAnalysis.contentFingerprint(r.getString(textIdx))))(Encoders.STRING)
        .transformWithState(
          new BudgetProcessor(1L, horizonMs, tsIdx, idIdx),
          tsCol, OutputMode.Append())(rowEnc)
      // downstream stages inherit the event-time column each TWS stage
      // re-declares (eventTimeColumnName) — declaring a watermark again
      // is an analysis error in multi-stateful-operator plans
      val suppressed = StreamingDedup.nearDupSuppress(
        exact, idCol, tsCol, textCol, numHashes, bands, shingleSize,
        estThreshold, watermarkDelay = watermarkDelay, horizonMs = horizonMs)
      suppressed
        .groupByKey((r: Row) =>
          if (r.isNullAt(hostIdx)) "\u0000" else String.valueOf(r.get(hostIdx)))(
          Encoders.STRING)
        .transformWithState(
          new BudgetProcessor(maxPerHost.toLong, 0L, tsIdx, idIdx),
          tsCol, OutputMode.Append())(rowEnc)
    }
  }

  /** [[webIngestStream]] with the dedup stages FULLY IN-STREAM: the
    * stateless cleaned front end ([[cleanedFrontEnd]] — the same
    * stage list and options as every other face) feeds
    * [[inlineDedupAndCap]], so the emitted rows are the curated,
    * near-dup-suppressed, host-capped corpus with no sink-side
    * compaction step. Prefer this face on Spark 4 clusters with the
    * RocksDB state store; [[webIngestWithNearDup]] remains for state
    * stores without `transformWithState`.
    */
  def webIngestStreamInline(
      docs: DataFrame,
      idCol: String,
      tsCol: String,
      htmlCol: String,
      urlCol: String,
      langs: Seq[String] = Seq.empty,
      maxPerHost: Int = 100000,
      watermarkDelay: String = "10 minutes",
      blocklist: Option[DataFrame] = None,
      canonicalizeNfc: Boolean = false,
      c4: Boolean = false,
      soft404: Boolean = false,
      redactPii: Boolean = false,
      mainContent: Boolean = false,
      stripTracking: Boolean = false,
      numHashes: Int = 128,
      bands: Int = 32,
      estThreshold: Double = 0.7,
      paragraphBreaks: Boolean = false,
      paragraphDedup: Boolean = false,
      minParagraphChars: Int = 5,
      minLineChars: Int = 5,
  ): DataFrame = {
    val lined = cleanedFrontEnd(
      docs, idCol, tsCol, htmlCol, urlCol, langs, blocklist, canonicalizeNfc, c4,
      soft404, redactPii, mainContent, stripTracking, paragraphBreaks, paragraphDedup,
      minParagraphChars, minLineChars)
    inlineDedupAndCap(lined, "id", "ts", "text", "url_host", maxPerHost,
      numHashes = numHashes, bands = bands, estThreshold = estThreshold,
      watermarkDelay = watermarkDelay)
  }

  def webIngestWithNearDup(
      docs: DataFrame,
      idCol: String,
      tsCol: String,
      htmlCol: String,
      urlCol: String,
      langs: Seq[String] = Seq.empty,
      maxPerHost: Int = 100000,
      dedupWatermark: String = "10 minutes",
      blocklist: Option[DataFrame] = None,
      canonicalizeNfc: Boolean = false,
      c4: Boolean = false,
      soft404: Boolean = false,
      redactPii: Boolean = false,
      mainContent: Boolean = false,
      stripTracking: Boolean = false,
      numHashes: Int = 128,
      bands: Int = 32,
      estThreshold: Double = 0.7,
      nearDupWatermark: String = "10 minutes",
      paragraphBreaks: Boolean = false,
      paragraphDedup: Boolean = false,
      minParagraphChars: Int = 5,
      minLineChars: Int = 5,
  ): (DataFrame, DataFrame) = {
    val lined = cleanedFrontEnd(
      docs, idCol, tsCol, htmlCol, urlCol, langs, blocklist, canonicalizeNfc, c4,
      soft404, redactPii, mainContent, stripTracking, paragraphBreaks, paragraphDedup,
      minParagraphChars, minLineChars)
    val deduped = EventStreams
      .dedupStream(lined, "ts", "text", dedupWatermark)
      .drop("content_fp")
    val main = capPerHostStream(deduped, "id", "ts", "url_host", maxPerHost)
    val victims = StreamingDedup
      .nearDupHits(lined, "id", "ts", "text",
        numHashes = numHashes, bands = bands, estThreshold = estThreshold,
        watermarkDelay = nearDupWatermark)
      .toDF()
      .select(
        col("victim_id"),
        when(col("victim_id") === col("id_a"), col("id_b")).otherwise(col("id_a"))
          .as("kept_id"),
        col("est_jaccard"), col("ts"))
    (main, victims)
  }
}
