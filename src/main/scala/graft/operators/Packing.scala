package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Training-sequence layout operators: deterministic global ordering
  * primitives a pre-training data pipeline runs after cleaning —
  * sequence packing (where does each document land in the
  * fixed-length token stream?) and seeded corpus interleave
  * (a reproducible global shuffle).
  *
  * Both need a GLOBAL prefix over a total order, which naively is a
  * single-partition window — the classic scale trap (`Window.orderBy`
  * with no partition spec funnels 100 TB through one task). Instead
  * [[withPrefixSum]] runs the textbook distributed prefix sum:
  * range-partition on the order key, cumulate WITHIN partitions
  * (parallel), cumulate the per-partition totals (one tiny
  * single-partition window over #partitions rows), broadcast those
  * offsets back. Results are bit-identical to the global window — the
  * DuckDB oracles check exactly that — at every corpus size.
  */
object Packing {

  /** Adds `outCol` = EXCLUSIVE prefix sum of `valueCol` over the total
    * order `orderCols` (sum of all strictly-preceding rows; first row
    * gets 0).
    *
    * The partition ids must be consistent between the offset
    * aggregation and the final join, so the range-partitioned frame is
    * persisted for the duration of the query (range boundaries come
    * from sampling; two independent recomputations could disagree).
    * Released once the caller materializes — pass the returned handle
    * to [[Dedup.materializeAndRelease]]-style cleanup or unpersist
    * after an action.
    */
  private[graft] def withPrefixSum(
      df: DataFrame,
      orderCols: Seq[String],
      value: Column,
      outCol: String,
  ): (DataFrame, DataFrame) =
    withPrefixSumOrdered(df, orderCols.map(col), value, outCol)

  /** [[withPrefixSum]] over arbitrary sort EXPRESSIONS (may carry
    * `.desc`, e.g. quality-first token-budget selection) — the range
    * partitioner, within-partition sort, and window all honor the sort
    * direction, and partition ids follow the range order, so the
    * offset cumulation by `__part` ascending remains the global prefix.
    */
  private[graft] def withPrefixSumOrdered(
      df: DataFrame,
      oc: Seq[Column],
      value: Column,
      outCol: String,
  ): (DataFrame, DataFrame) = {
    val parted = df
      .repartitionByRange(oc: _*)
      .sortWithinPartitions(oc: _*)
      .withColumn("__part", spark_partition_id())
      .withColumn("__v", value.cast("long"))
      .persist()
    // one row per partition → single-partition window is FINE here
    val offsets = parted
      .groupBy(col("__part"))
      .agg(sum(col("__v")).as("__psum"))
      .withColumn(
        "__offset",
        coalesce(
          sum(col("__psum")).over(
            Window.orderBy(col("__part")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L),
        ),
      )
      .select(col("__part"), col("__offset"))
    val local = Window
      .partitionBy(col("__part"))
      .orderBy(oc: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val out = parted
      .join(broadcast(offsets), "__part")
      .withColumn(outCol, coalesce(sum(col("__v")).over(local), lit(0L)) + col("__offset"))
      .drop("__part", "__v")
    (out, parted)
  }

  /** Sequence packing layout: documents are concatenated in `idCol`
    * order into one token stream cut into fixed `seqLen`-token
    * training sequences (GPT-style contiguous packing); each document
    * reports the half-open token interval it occupies and the first /
    * last sequence it lands in. Token counting matches the chunking
    * oracle (`split(trim(text), '\s+')` non-empties).
    *
    * Output: (id, n_tokens, start_offset, pack_first, pack_last),
    * ordered by id. Zero-token documents occupy no tokens and report
    * the pack the stream cursor is currently in.
    */
  def sequencePacking(
      df: DataFrame,
      idCol: String,
      textCol: String,
      seqLen: Int,
  ): DataFrame = {
    val toks = df.select(
      col(idCol),
      coalesce(
        expr(s"size(filter(split(trim($textCol), '\\\\s+'), x -> x != ''))"),
        lit(0),
      ).cast("long").as("n_tokens"),
    )
    sequencePackingByCount(toks, idCol, "n_tokens", seqLen)
  }

  /** [[sequencePacking]] over a PRECOMPUTED per-row token count (e.g.
    * chunk windows that already carry `n_chunk_tokens`), packing in
    * `orderCols` order.
    */
  def sequencePackingByCount(
      df: DataFrame,
      orderCol: String,
      countCol: String,
      seqLen: Int,
  ): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val toks = df.select(col(orderCol), coalesce(col(countCol), lit(0L)).cast("long").as("n_tokens"))
    val (prefixed, handle) = withPrefixSum(toks, Seq(orderCol), col("n_tokens"), "start_offset")
    val out = prefixed
      .withColumn("pack_first", expr(s"start_offset div $seqLen"))
      .withColumn(
        "pack_last",
        when(col("n_tokens") > 0, expr(s"(start_offset + n_tokens - 1) div $seqLen"))
          .otherwise(col("pack_first")),
      )
      .select(
        col(orderCol), col("n_tokens"), col("start_offset"), col("pack_first"), col("pack_last"))
      .orderBy(orderCol)
      // localCheckpoint, not persist: corpus-sized output returned to
      // the caller — no CacheManager pinning, blocks freed on GC
      .localCheckpoint(true)
    handle.unpersist(blocking = false)
    out
  }

  /** Whole-document best-fit packing — the SFT-style layout where a
    * document is never split across training sequences (contrast
    * [[sequencePacking]], the GPT-style contiguous stream that cuts
    * documents at sequence boundaries): each document lands whole in
    * exactly one `seqLen`-token bin, and the packer minimizes padding
    * with best-fit-DECREASING (sort by length desc, place each doc
    * in the FULLEST bin that still fits, ties to the lowest bin
    * index — the classic 11/9·OPT+1 bin-packing approximation).
    *
    * Distributed shape: BFD is inherently sequential, so the corpus
    * is given a GLOBAL (length desc, id) rank via the same
    * range-partitioned prefix machinery every layout operator uses
    * (one exchange), then cut into consecutive `groupSize`-row
    * segments, and BFD runs independently inside each segment
    * (`flatMapGroups`, segment sorted in memory — `groupSize` bounds
    * the memory, 4096 rows by default). Bins never cross segments:
    * the price is at most one underfull bin per segment boundary vs a
    * fully-sequential BFD — O(corpus/groupSize) extra bins,
    * vanishing at scale — and the win is that packing parallelizes
    * over segments with NO driver state and identical output on any
    * cluster layout (rank is a pure function of (length, id)).
    *
    * Documents longer than `seqLen` get a dedicated bin and
    * `truncated = true` (the downstream writer decides whether to
    * clip or reject); zero-token docs cost nothing and ride the
    * first open bin of their segment.
    *
    * Output: (id, n_tokens, pack_id, truncated) — `pack_id` is
    * globally unique (`segment·groupSize + local bin index`), stable
    * across runs.
    */
  def packBestFit(
      df: DataFrame,
      idCol: String,
      countCol: String,
      seqLen: Int,
      groupSize: Int = 4096,
  ): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    require(groupSize > 0, "groupSize must be positive")
    // the typed grouping path encodes ids as long; a silent
    // cast("long") would null every non-numeric id (string WARC ids)
    // and crash the encoder mid-job — fail at construction instead
    df.schema(idCol).dataType match {
      case _: org.apache.spark.sql.types.ByteType | _: org.apache.spark.sql.types.ShortType |
          _: org.apache.spark.sql.types.IntegerType | _: org.apache.spark.sql.types.LongType =>
      case other => throw new IllegalArgumentException(
        s"packBestFit requires an integral id column, got $other for '$idCol' " +
          "(map string ids to a long surrogate first, e.g. xxhash64)")
    }
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(
      col(idCol).cast("long").as("id"),
      coalesce(col(countCol), lit(0L)).cast("long").as("n_tokens"))
    val (ranked, handle) = withPrefixSumOrdered(
      base, Seq(col("n_tokens").desc, col("id")), lit(1L), "__rank")
    val out = ranked
      .select(col("id"), col("n_tokens"), col("__rank"))
      .as[(Long, Long, Long)]
      .groupByKey(_._3 / groupSize)
      .flatMapGroups { (seg: Long, it: Iterator[(Long, Long, Long)]) =>
        val rows = it.toArray.sortBy { case (id, n, _) => (-n, id) }
        val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
        rows.iterator.map { case (id, n, _) =>
          val need = math.min(n, seqLen.toLong)
          // best fit: the fullest bin that still takes `need`
          // (leaves the least slack), ties to the lowest index
          var best = -1
          var b = 0
          while (b < fills.length) {
            if (fills(b) + need <= seqLen && (best < 0 || fills(b) > fills(best))) best = b
            b += 1
          }
          if (best < 0) { fills += 0L; best = fills.length - 1 }
          fills(best) += need
          (id, n, seg * groupSize + best, n > seqLen)
        }
      }
      .toDF("id", "n_tokens", "pack_id", "truncated")
      .orderBy("id")
      .localCheckpoint(true)
    handle.unpersist(blocking = false)
    out
  }

  /** Padding diagnostics for a [[packBestFit]] layout: one row —
    * (n_docs, n_packs, total_tokens, capacity, padding_fraction) with
    * oversized docs counted at their clipped `seqLen` cost (what the
    * bin actually holds).
    */
  def packEfficiency(packed: DataFrame, seqLen: Int): DataFrame =
    packed
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("pack_id")).as("n_packs"),
        sum(least(col("n_tokens"), lit(seqLen.toLong))).as("total_tokens"))
      .select(
        col("n_docs"),
        col("n_packs"),
        col("total_tokens"),
        (col("n_packs") * seqLen).as("capacity"),
        (lit(1.0) - col("total_tokens").cast("double") / (col("n_packs") * seqLen))
          .as("padding_fraction"))

  /** Fused [[deterministicShuffle]] + [[sequencePackingByCount]]: the
    * shuffle POSITION is a prefix COUNT and the pack OFFSET is a
    * prefix SUM over the SAME seeded hash order, so both come out of
    * ONE range exchange and one window pass (two running aggregates
    * over one sort) — half the shuffles and materializations of
    * composing the two operators, bit-identical output (locked by
    * PackingSpec).
    *
    * Output: (id, shuffle_key, pos, n_tokens, start_offset,
    * pack_first, pack_last) ordered by pos.
    */
  def shuffleAndPack(
      df: DataFrame,
      idCol: String,
      countCol: String,
      seqLen: Int,
      salt: String,
  ): DataFrame = shuffleAndPackImpl(df, idCol, countCol, seqLen, salt, ordered = true)

  /** [[shuffleAndPack]] WITHOUT the terminal global `orderBy(pos)` —
    * for pipeline-internal consumers that immediately equi-join the
    * layout back onto the chunk frame (webIngest, prepareSequences):
    * the join destroys row order anyway, and the public face's
    * ordered output costs a range-boundary sampling job plus a
    * full-output range exchange + sort per call (r22, guide §2.4).
    * Same rows, same values, same checkpointed landing.
    */
  private[graft] def shuffleAndPackUnordered(
      df: DataFrame,
      idCol: String,
      countCol: String,
      seqLen: Int,
      salt: String,
  ): DataFrame = shuffleAndPackImpl(df, idCol, countCol, seqLen, salt, ordered = false)

  private def shuffleAndPackImpl(
      df: DataFrame,
      idCol: String,
      countCol: String,
      seqLen: Int,
      salt: String,
      ordered: Boolean,
  ): DataFrame = {
    val (frame, parted) = shuffleAndPackFrame(df, idCol, countCol, seqLen, salt, ordered)
    val out = frame.localCheckpoint(true)
    parted.unpersist(blocking = false)
    out
  }

  /** The un-checkpointed plan behind [[shuffleAndPack]] /
    * [[shuffleAndPackUnordered]], plus the persisted range-partitioned
    * handle the caller must unpersist after materializing. Split out so
    * the optimization-round evidence dumps can explain the INTERIOR
    * frame (the public faces checkpoint, which collapses the plan to a
    * `Scan ExistingRDD`).
    */
  private[graft] def shuffleAndPackFrame(
      df: DataFrame,
      idCol: String,
      countCol: String,
      seqLen: Int,
      salt: String,
      ordered: Boolean,
  ): (DataFrame, DataFrame) = {
    require(seqLen > 0, "seqLen must be positive")
    val keyed = df.select(
      col(idCol),
      coalesce(col(countCol), lit(0L)).cast("long").as("n_tokens"),
      md5(concat(col(idCol).cast("string"), lit(":" + salt))).as("shuffle_key"),
    )
    val parted = keyed
      .repartitionByRange(col("shuffle_key"), col(idCol))
      .sortWithinPartitions(col("shuffle_key"), col(idCol))
      .withColumn("__part", spark_partition_id())
      .persist()
    val offsets = parted
      .groupBy(col("__part"))
      .agg(count(lit(1)).as("__nrows"), sum(col("n_tokens")).as("__ntoks"))
      .withColumn(
        "__row_off",
        coalesce(
          sum(col("__nrows")).over(
            Window.orderBy(col("__part")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn(
        "__tok_off",
        coalesce(
          sum(col("__ntoks")).over(
            Window.orderBy(col("__part")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__part"), col("__row_off"), col("__tok_off"))
    val w = Window.partitionBy(col("__part")).orderBy(col("shuffle_key"), col(idCol))
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val cols = parted
      .join(broadcast(offsets), "__part")
      .withColumn("pos", row_number().over(w).cast("long") + col("__row_off"))
      .withColumn(
        "start_offset",
        coalesce(sum(col("n_tokens")).over(wPrev), lit(0L)) + col("__tok_off"))
      .withColumn("pack_first", expr(s"start_offset div $seqLen"))
      .withColumn(
        "pack_last",
        when(col("n_tokens") > 0, expr(s"(start_offset + n_tokens - 1) div $seqLen"))
          .otherwise(col("pack_first")),
      )
      .select(
        col(idCol), col("shuffle_key"), col("pos"), col("n_tokens"),
        col("start_offset"), col("pack_first"), col("pack_last"))
    (if (ordered) cols.orderBy("pos") else cols, parted)
  }

  /** Seeded deterministic corpus interleave — the reproducible global
    * shuffle a training run needs for data ordering: every row gets a
    * stable position `pos` (1-based) in the order of
    * `md5(id || ':' || salt)`. Same salt → same order on any cluster
    * layout; changing the salt is a fresh epoch-level reshuffle.
    * Content-independent, so the order carries no length/quality bias.
    *
    * Output: (id, shuffle_key, pos) ordered by id. Position
    * assignment is the distributed prefix sum of 1s — no global
    * single-partition window, no zipWithIndex RDD round-trip.
    */
  def deterministicShuffle(df: DataFrame, idCol: String, salt: String): DataFrame = {
    val keyed = df.select(
      col(idCol),
      md5(concat(col(idCol).cast("string"), lit(":" + salt))).as("shuffle_key"),
    )
    val (prefixed, handle) =
      withPrefixSum(keyed, Seq("shuffle_key", idCol), lit(1L), "__pos0")
    val out = prefixed
      .withColumn("pos", col("__pos0") + 1L)
      .select(col(idCol), col("shuffle_key"), col("pos"))
      .orderBy(idCol)
      .localCheckpoint(true)
    handle.unpersist(blocking = false)
    out
  }
}
