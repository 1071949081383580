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

  /** One group's Count-Min grid after a trigger (update semantics —
    * the grid is cumulative over the group's whole key slice).
    */
  final case class CmsUpdate(
      group_id: Int,
      table: Array[Long],
      total_seen: Long,
  )

  /** Streaming face of [[Sketches.countMinSketch]]: the key space
    * hash-partitions into `numGroups` slices, each maintaining its
    * own depth×width grid in `mapGroupsWithState`. Counter addition
    * is commutative, so each group's grid is BIT-IDENTICAL to the
    * batch sketch of its slice regardless of micro-batch boundaries
    * (StreamingSpec pins that). Readers sum the latest grid per group
    * back into the whole-stream sketch ([[mergeCmsUpdates]]); state is
    * O(numGroups × depth × width) forever — size `width` down from
    * the batch default accordingly (streams answer point queries on
    * recent-ish keys; 2^12 per group ≈ 32 KiB × depth).
    */
  def cmsStream(
      df: DataFrame,
      keyCol: String,
      depth: Int = 4,
      width: Int = 1 << 12,
      numGroups: Int = 16,
      seed: Long = 42L,
  ): Dataset[CmsUpdate] = {
    require(depth > 0 && width > 0 && numGroups > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val proto = Sketches.CmsModel(depth, width, seed, Array.empty)
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
        (gid: Int, rows: Iterator[(String, Int)], state: GroupState[(Array[Long], Long)]) => {
          val (t, prevSeen) = state.getOption
            .map { case (tab, n) => (tab.clone(), n) }
            .getOrElse((new Array[Long](depth * width), 0L))
          var seen = prevSeen
          rows.foreach { case (k, _) =>
            var r = 0
            while (r < depth) { t(r * width + proto.bucket(k, r)) += 1; r += 1 }
            seen += 1
          }
          state.update((t, seen))
          CmsUpdate(gid, t, seen)
        },
      )
  }

  /** Rebuild the whole-stream sketch from the LATEST update per
    * group: slices are disjoint and counters add, so the element-wise
    * sum of the group grids is BIT-IDENTICAL to
    * [[Sketches.countMinSketch]] over everything the stream has seen
    * — point-estimate keys on the returned model directly.
    */
  def mergeCmsUpdates(
      updates: Seq[CmsUpdate],
      depth: Int = 4,
      width: Int = 1 << 12,
      seed: Long = 42L,
  ): Sketches.CmsModel = {
    val table = new Array[Long](depth * width)
    updates.groupBy(_.group_id).foreach { case (_, us) =>
      val t = us.last.table
      var i = 0
      while (i < table.length) { table(i) += t(i); i += 1 }
    }
    Sketches.CmsModel(depth, width, seed, table)
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

  /** One group's HLL registers after a trigger (update semantics —
    * cumulative over the group's whole key slice).
    */
  final case class HllUpdate(
      group_id: Int,
      registers: Array[Byte],
      total_seen: Long,
  )

  /** Streaming face of [[Sketches.hyperLogLog]]: the key space
    * hash-partitions into `numGroups` slices, each maintaining its
    * own 2^p register array in `mapGroupsWithState`. Register max is
    * commutative and associative, so each group's registers are
    * BIT-IDENTICAL to the batch sketch of its slice regardless of
    * micro-batch boundaries, and the element-wise max of the latest
    * group registers is BIT-IDENTICAL to the batch sketch of the
    * whole stream ([[mergeHllUpdates]]; a register index collects the
    * max rank over ALL keys that hash to it — max over disjoint key
    * slices is that same max). State is O(numGroups × 2^p) forever.
    */
  def hllStream(
      df: DataFrame,
      keyCol: String,
      p: Int = 12,
      numGroups: Int = 16,
      seed: Long = 42L,
  ): Dataset[HllUpdate] = {
    Sketches.Hll.checkP(p)
    require(numGroups > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val m = 1 << p
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
        (gid: Int, rows: Iterator[(String, Int)], state: GroupState[(Array[Byte], Long)]) => {
          val (regs, prevSeen) = state.getOption
            .map { case (r, n) => (r.clone(), n) }
            .getOrElse((new Array[Byte](m), 0L))
          var seen = prevSeen
          rows.foreach { case (k, _) =>
            Sketches.Hll.update(regs, k, p, seed)
            seen += 1
          }
          state.update((regs, seen))
          HllUpdate(gid, regs, seen)
        },
      )
  }

  /** Rebuild the whole-stream HLL from the LATEST update per group —
    * element-wise max, bit-identical to [[Sketches.hyperLogLog]] over
    * everything the stream has seen.
    */
  def mergeHllUpdates(
      updates: Seq[HllUpdate],
      p: Int = 12,
      seed: Long = 42L,
  ): Sketches.HllModel = {
    val regs = new Array[Byte](1 << p)
    updates.groupBy(_.group_id).foreach { case (_, us) =>
      Sketches.Hll.maxMerge(regs, us.last.registers)
    }
    Sketches.HllModel(p, seed, regs)
  }

  /** One group's KLL compactor state after a trigger (update
    * semantics — cumulative over the group's whole value slice).
    * Levels ride flattened for a plain product encoder.
    */
  final case class KllUpdate(
      group_id: Int,
      n: Long,
      level_lens: Array[Int],
      values: Array[Double],
  )

  /** Streaming face of [[Sketches.kllSketch]]: the VALUE space
    * hash-partitions into `numGroups` slices (by value hash — a
    * quantile sketch has no key), each maintaining a KLL builder in
    * `mapGroupsWithState`. Merging the latest builder per group gives
    * the whole-stream sketch with KLL's union guarantees; in the
    * exact regime (k ≥ slice sizes, no compaction) the merged
    * quantiles EQUAL the batch operator's — the StreamingSpec-pinned
    * contract, same shape as the CMS/HLL faces. State is
    * O(numGroups × k) forever.
    */
  def kllStream(
      df: DataFrame,
      valCol: String,
      k: Int = 1024,
      numGroups: Int = 16,
      seed: Long = 42L,
  ): Dataset[KllUpdate] = {
    require(numGroups > 0)
    val spark = df.sparkSession
    import spark.implicits._
    // builders hold ArrayBuffers — kryo state, product output
    implicit val kllStateEnc: org.apache.spark.sql.Encoder[Sketches.KllBuilder] =
      org.apache.spark.sql.Encoders.kryo[Sketches.KllBuilder]
    val keyed = df
      .select(
        col(valCol).cast("double").as("v"),
        pmod(hash(col(valCol).cast("double")), lit(numGroups)).as("group_id"),
      )
      .where(col("v").isNotNull)
      .as[(Double, Int)]
    keyed
      .groupByKey(_._2)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (gid: Int, rows: Iterator[(Double, Int)], state: GroupState[Sketches.KllBuilder]) => {
          // builders are mutable: clone-in so a failed trigger can't
          // have half-applied updates in the committed state
          val b = state.getOption
            .map(_.cloneBuilder())
            .getOrElse(new Sketches.KllBuilder(k, seed + gid))
          rows.foreach { case (v, _) => b.update(v) }
          state.update(b)
          val lens = b.levels.map(_.length).toArray
          val flat = b.levels.iterator.flatMap(_.iterator).toArray
          KllUpdate(gid, b.n, lens, flat)
        },
      )
  }

  /** Rebuild the whole-stream sketch from the LATEST update per
    * group — KLL merge of disjoint value slices. Exact-regime
    * quantiles equal [[Sketches.kllSketch]] over everything seen.
    */
  def mergeKllUpdates(
      updates: Seq[KllUpdate],
      k: Int = 1024,
      seed: Long = 42L,
  ): Sketches.KllBuilder = {
    val out = new Sketches.KllBuilder(k, seed - 1)
    updates.groupBy(_.group_id).foreach { case (_, us) =>
      val u = us.last
      val b = new Sketches.KllBuilder(k, seed - 1)
      var off = 0
      u.level_lens.zipWithIndex.foreach { case (len, lvl) =>
        while (b.levels.length <= lvl)
          b.levels += scala.collection.mutable.ArrayBuffer.empty[Double]
        var i = 0
        while (i < len) { b.levels(lvl) += u.values(off + i); i += 1 }
        off += len
      }
      b.n = u.n
      out.merge(b)
    }
    out
  }
}
