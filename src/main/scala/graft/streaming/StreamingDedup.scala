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
    val r = numHashes / bands
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
        explode(
          expr(s"transform(sequence(0, ${bands - 1}), b -> " +
            s"concat_ws(':', b, hash(slice(sig, b * $r + 1, $r))))"),
        ).as("bucket"),
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
}
