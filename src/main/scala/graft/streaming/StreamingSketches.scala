package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

import graft.operators.Sketches

/** Streaming frequency sketches — the stream face of
  * [[Sketches.heavyHitters]].
  *
  * State layout: the key space hash-partitions into `numGroups`
  * Misra-Gries summaries, each capacity-bounded, maintained in
  * `mapGroupsWithState`. Total state is O(numGroups × capacity)
  * REGARDLESS of key cardinality or stream length — the whole point
  * of running a sketch instead of a streaming groupBy count (whose
  * state grows with distinct keys forever). Each trigger emits every
  * touched group's full summary (update semantics); readers merge the
  * LATEST summary per group with the same mergeable-summaries rule
  * the batch Aggregator uses ([[mergeUpdates]]).
  *
  * Guarantees after merging: count̂ ∈ [true − N/(capacity+1), true]
  * per group-slice, so with capacity ≥ distinct-keys-per-group the
  * merged counts are EXACT — the regime StreamingSpec pins against
  * the batch operator.
  */
object StreamingSketches {

  /** One group's summary after a trigger: entries sorted by
    * (-count, key), plus the total rows this group has EVER seen
    * (exact — it's a counter, not a sketch).
    */
  final case class HeavyHittersUpdate(
      group_id: Int,
      entries: Array[(String, Long)],
      total_seen: Long,
  )

  /** Maintain per-group MG summaries over a (possibly streaming)
    * frame. Works identically on a batch frame (one "trigger").
    */
  def heavyHittersStream(
      df: DataFrame,
      keyCol: String,
      capacity: Int,
      numGroups: Int = 16,
  ): Dataset[HeavyHittersUpdate] = {
    require(capacity > 0 && numGroups > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df
      .select(
        col(keyCol).cast("string").as("key"),
        pmod(hash(col(keyCol).cast("string")), lit(numGroups)).as("group_id"),
      )
      .where(col("key").isNotNull)
      .as[(String, Int)]
    keyed
      .groupByKey(_._2)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (gid: Int, rows: Iterator[(String, Int)], state: GroupState[(Map[String, Long], Long)]) => {
          val (prev, prevSeen) = state.getOption.getOrElse((Map.empty[String, Long], 0L))
          val m = scala.collection.mutable.HashMap[String, Long](prev.toSeq: _*)
          var seen = prevSeen
          rows.foreach { case (k, _) =>
            Sketches.Mg.update(m, k, capacity)
            seen += 1
          }
          state.update((m.toMap, seen))
          HeavyHittersUpdate(gid, Sketches.Mg.sorted(m), seen)
        },
      )
  }

  /** Merge the LATEST update per group into a global top-`topN`
    * (key, approx_count) list — run over the collected output of a
    * memory/table sink, or inside foreachBatch.
    */
  def mergeUpdates(
      updates: Seq[HeavyHittersUpdate],
      capacity: Int,
      topN: Int,
  ): Seq[(String, Long)] = {
    val latest = updates.groupBy(_.group_id).map { case (_, us) => us.last }
    val merged = scala.collection.mutable.HashMap.empty[String, Long]
    // group summaries are over DISJOINT key slices: plain union, no
    // capacity squeeze — each key lives in exactly one group
    latest.foreach(u => u.entries.foreach { case (k, c) =>
      merged.update(k, merged.getOrElse(k, 0L) + c)
    })
    Sketches.Mg.sorted(merged).take(topN).toSeq
  }
}
