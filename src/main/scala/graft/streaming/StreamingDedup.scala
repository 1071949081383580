package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

import graft.operators.Dedup

/** Streaming NEAR-duplicate detection: MinHash-banded collision state
  * over a document stream — the stream face of
  * [[graft.operators.Dedup.minHashNearDupPairs]].
  *
  * Shape: each incoming doc is signed once (densified OPH, the same
  * [[Dedup.ophSignature]] the batch path bands), exploded into its
  * `bands` band-buckets, and grouped by bucket into
  * `flatMapGroupsWithState`. Per bucket the state holds the most
  * recent `maxPerBucket` (doc_id, signature) entries; a new arrival
  * compares against them and emits a pair when the SIGNATURE-ESTIMATED
  * Jaccard (fraction of agreeing MinHash slots — the standard unbiased
  * estimator) clears `estThreshold`.
  *
  * Scale/state design:
  *   - State is per BAND-BUCKET, keyed by the band hash: population
  *     concentrates exactly where near-dups are, and each entry is
  *     id + numHashes longs (~1 KB at 128 hashes) × `maxPerBucket`
  *     cap × active buckets — no grams, no text, ever.
  *   - Event-time timeout purges buckets idle past `horizon`, so
  *     total state is bounded by ingest-rate × horizon like every
  *     watermarked operator; duplicates farther apart than the
  *     horizon are the standing-corpus Bloom path's job
  *     ([[graft.operators.Dedup.newDocsOnly]]).
  *   - A pair colliding in several bands is emitted once per
  *     colliding band; consumers wanting distinct pairs apply
  *     `dropDuplicatesWithinWatermark(Seq("id_a","id_b"))` (each
  *     emission carries the triggering doc's event time).
  *
  * Approximation contract: the estimate is E[est] = true Jaccard with
  * sd ≈ √(J(1−J)/numHashes) (≈0.04 at J=0.8, 128 hashes); the batch
  * operator's exact-verify path remains the precision tool — this one
  * buys bounded-latency firehose detection.
  */
object StreamingDedup {

  final case class BandedDoc(
      bucket: String,
      doc_id: Long,
      ts: Timestamp,
      sig: Array[Long],
  )
  /** `id_a`/`id_b` are the pair sorted by id; `victim_id` is the
    * LATER ARRIVAL of the two (the doc that triggered the hit against
    * standing bucket state) — the one a keep-first suppression policy
    * drops. Within a microbatch "arrival" is (event-time, id) order,
    * so victim selection is deterministic on event-ordered input.
    */
  final case class NearDupHit(
      id_a: Long, id_b: Long, victim_id: Long, est_jaccard: Double, ts: Timestamp)
  final case class BucketState(entries: List[(Long, Array[Long])])

  /** docs: (idCol: long, tsCol: timestamp, textCol: string) — works on
    * a stream (watermarked, stateful) AND on a bounded batch frame
    * (same code path via the batch flatMapGroupsWithState evaluator).
    */
  def nearDupHits(
      docs: DataFrame,
      idCol: String,
      tsCol: String,
      textCol: String,
      numHashes: Int = 128,
      bands: Int = 32,
      shingleSize: Int = 3,
      estThreshold: Double = 0.7,
      maxPerBucket: Int = 64,
      watermarkDelay: String = "10 minutes",
      horizonMs: Long = 3600L * 1000L,
  ): Dataset[NearDupHit] = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val spark = docs.sparkSession
    import spark.implicits._
    val sigUdf = udf { (text: String) =>
      val grams = graft.textutil.TextHash.sortedShingleSet(text, shingleSize)
      if (grams.isEmpty) null else graft.textutil.TextHash.ophSignature(grams, numHashes)
    }
    val signed = docs
      .select(
        col(idCol).cast("long").as("doc_id"),
        col(tsCol).as("ts"),
        sigUdf(col(textCol)).as("sig"),
      )
      .where(col("sig").isNotNull)
    // plain value for the state closure — capturing the Dataset itself
    // to ask isStreaming inside a task NPEs (plans don't serialize)
    val streaming = signed.isStreaming
    val withWm = if (streaming) signed.withWatermark("ts", watermarkDelay) else signed
    val banded = withWm
      .select(
        col("doc_id"),
        col("ts"),
        col("sig"),
        // the SAME band key space as every batch face (Dedup.bandKeysCol)
        explode(Dedup.bandKeysCol(numHashes, bands)).as("bucket"),
      )
      .as[BandedDoc]

    banded
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        (_: String, rows: Iterator[BandedDoc], state: GroupState[BucketState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var entries = state.getOption.map(_.entries).getOrElse(Nil)
            val out = List.newBuilder[NearDupHit]
            var lastMs = 0L
            rows.toSeq.sortBy(d => (d.ts.getTime, d.doc_id)).foreach { d =>
              entries.foreach { case (oldId, oldSig) =>
                if (oldId != d.doc_id) {
                  var agree = 0
                  var i = 0
                  while (i < numHashes) {
                    if (oldSig(i) == d.sig(i)) agree += 1
                    i += 1
                  }
                  val est = agree.toDouble / numHashes
                  if (est >= estThreshold)
                    out += NearDupHit(
                      math.min(oldId, d.doc_id), math.max(oldId, d.doc_id),
                      d.doc_id, est, d.ts)
                }
              }
              entries = ((d.doc_id, d.sig) :: entries).take(maxPerBucket)
              lastMs = math.max(lastMs, d.ts.getTime)
            }
            state.update(BucketState(entries))
            if (streaming)
              state.setTimeoutTimestamp(
                math.max(lastMs + horizonMs, state.getCurrentWatermarkMs + 1),
              )
            out.result().iterator
          }
        },
      )
  }

  /** A stream document that near-duplicates a STANDING-corpus doc:
    * `jaccard` is the EXACT shingle Jaccard (the corpus signature
    * table carries gram sets, so no estimate is needed), `ts` the
    * stream row's event time. A pair colliding in several bands emits
    * once per band — `dropDuplicatesWithinWatermark(Seq("id",
    * "corpus_id"))` at the sink if multiplicity matters.
    */
  final case class CorpusDupHit(id: Long, corpus_id: Long, jaccard: Double, ts: Timestamp)

  /** STREAM-vs-STANDING-CORPUS near-dup — the streaming face of
    * [[graft.operators.Dedup.nearDupNewDocs]], against the same
    * [[graft.operators.Dedup.minHashSignatures]] parquet table and in
    * the same band key space: each stream doc is signed once, exploded
    * into its band buckets, and INNER-JOINED against the corpus's
    * banded signature table (a stream-static equi-join — stateless,
    * append-safe, no watermark or state at all, unlike the in-stream
    * [[nearDupHits]] path), then verified with exact shingle Jaccard
    * against the corpus gram sets.
    *
    * Why hits, not suppression: dropping the flagged rows in-stream
    * would need an anti-join of the stream against its own derived
    * hits (not an append-supported plan); landing the hit stream and
    * anti-joining in the periodic batch compaction is the same
    * sink-side policy as [[StreamingWebIngest.webIngestWithNearDup]].
    * Works on a bounded batch frame too (plain joins), which is what
    * the stream ≡ batch spec and the q128 driver gate evaluate.
    *
    * Scale shape: the corpus contributes its banded SIGNATURE table —
    * numHashes longs per doc, linear in corpus doc count, text never
    * read. Corpus band buckets over `maxBucketSize` members are
    * DROPPED before the join (the batch paths' skew cap, same recall
    * caveat: a boilerplate bucket shared by millions of standing docs
    * would otherwise cross-join against every colliding stream row
    * each microbatch). Spark re-plans the static side per microbatch;
    * at very large corpora pre-bucket the parquet by the band key so
    * it prunes instead of re-shuffling.
    */
  def corpusNearDupHits(
      docs: DataFrame,
      idCol: String,
      tsCol: String,
      textCol: String,
      corpusSigs: DataFrame,
      numHashes: Int = 128,
      bands: Int = 32,
      shingleSize: Int = 3,
      threshold: Double = 0.8,
      maxBucketSize: Int = 1000,
  ): Dataset[CorpusDupHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val prepUdf = udf { (text: String) =>
      val grams = graft.textutil.TextHash.sortedShingleSet(text, shingleSize)
      if (grams.isEmpty) null
      else (graft.textutil.TextHash.ophSignature(grams, numHashes), grams)
    }
    val banded = docs
      .select(
        col(idCol).cast("long").as("id"),
        col(tsCol).as("ts"),
        prepUdf(col(textCol)).as("p"))
      .where(col("p").isNotNull)
      .select(col("id"), col("ts"), col("p._1").as("sig"), col("p._2").as("grams"))
      .select(col("id"), col("ts"), col("grams"),
        explode(Dedup.bandKeysCol(numHashes, bands)).as("bucket"))
    val corpusSide0 = corpusSigs
      .select(col("id").as("corpus_id"), col("sig"), col("grams").as("grams_o"),
        size(col("grams")).as("sz_o"))
      .select(col("corpus_id"), col("grams_o"), col("sz_o"),
        explode(Dedup.bandKeysCol(numHashes, bands)).as("bucket"))
    // skew cap on the STATIC side (the stream side cannot be counted
    // ahead of time): oversized corpus buckets drop entirely
    val corpusSide = corpusSide0.join(
      corpusSide0.groupBy("bucket").agg(count(lit(1)).as("__n"))
        .where(col("__n") <= maxBucketSize.toLong)
        .select("bucket"),
      "bucket")
    banded
      .join(corpusSide, "bucket")
      .withColumn("inter", graft.functions.VectorExpressions
        .sortedIntersectCount(col("grams"), col("grams_o")))
      .withColumn("jaccard",
        col("inter").cast("double") / (size(col("grams")) + col("sz_o") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("id"), col("corpus_id"), col("jaccard"), col("ts"))
      .as[CorpusDupHit]
  }

  /** [[corpusNearDupHits]] against a persisted
    * [[graft.operators.Dedup.SignatureStore]] — identical hit
    * semantics (spec asserts parity), with the per-microbatch corpus
    * work removed: the banded table joins on its own bucketing key
    * with NO static-side exchange, NO re-explode of corpus
    * signatures, and NO per-microbatch bucket recount or self-join
    * (the skew cap was applied at write; `bucket_n` rides each row).
    * The exact-verify gram sets come from the store's id-bucketed
    * `grams` table, touched only for banding-collision candidates.
    */
  def corpusNearDupHits(
      docs: DataFrame,
      idCol: String,
      tsCol: String,
      textCol: String,
      store: Dedup.SignatureStore,
      threshold: Double,
  ): Dataset[CorpusDupHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val numHashes = store.numHashes
    val prepUdf = udf { (text: String) =>
      val grams = graft.textutil.TextHash.sortedShingleSet(text, store.shingleSize)
      if (grams.isEmpty) null
      else (graft.textutil.TextHash.ophSignature(grams, numHashes), grams)
    }
    val banded = docs
      .select(
        col(idCol).cast("long").as("id"),
        col(tsCol).as("ts"),
        prepUdf(col(textCol)).as("p"))
      .where(col("p").isNotNull)
      .select(col("id"), col("ts"), col("p._1").as("sig"), col("p._2").as("grams"))
      .select(col("id"), col("ts"), col("grams"),
        explode(Dedup.bandKeysCol(numHashes, store.bands)).as("bucket"))
    banded
      .join(store.banded.select(col("bucket"), col("id").as("corpus_id")), "bucket")
      .join(
        store.grams.select(col("id").as("corpus_id"), col("grams").as("grams_o"),
          size(col("grams")).as("sz_o")),
        "corpus_id")
      .withColumn("inter", graft.functions.VectorExpressions
        .sortedIntersectCount(col("grams"), col("grams_o")))
      .withColumn("jaccard",
        col("inter").cast("double") / (size(col("grams")) + col("sz_o") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("id"), col("corpus_id"), col("jaccard"), col("ts"))
      .as[CorpusDupHit]
  }
}
