package graft.operators

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Encoder, Encoders}

/** Bounded-memory frequency sketches. At 100 TB "what are the heavy
  * keys?" must be answerable WITHOUT a full groupBy — the profile
  * feeds skew decisions (salting, broadcast thresholds, bucket caps)
  * BEFORE the expensive job runs, so it can't itself be an expensive
  * job. The sketch shuffles one `capacity`-sized summary per
  * partition, never per-key rows.
  */
object Sketches {

  /** Misra-Gries heavy-hitters summary (MG82; merge rule from Agarwal
    * et al., "Mergeable Summaries", PODS'12): at most `capacity`
    * counters; every reported count̂ satisfies
    * `true − N/(capacity+1) ≤ count̂ ≤ true`, so any key with
    * frequency > N/(capacity+1) is guaranteed present. With
    * `capacity ≥ |distinct keys|` no decrement ever fires and counts
    * are EXACT — the oracle-checked regime.
    */
  /** The MG update/merge kernels — shared by the batch Aggregator and
    * the streaming state operator
    * ([[graft.streaming.StreamingSketches]]).
    */
  private[graft] object Mg {
    type Summary = scala.collection.mutable.HashMap[String, Long]

    def update(m: Summary, key: String, capacity: Int): Unit =
      if (key != null) {
        m.get(key) match {
          case Some(c) => m.update(key, c + 1)
          case None if m.size < capacity => m.update(key, 1L)
          case None =>
            // decrement-all; drop zeros (the classic MG step)
            val dead = scala.collection.mutable.ArrayBuffer.empty[String]
            m.foreach { case (k, c) => if (c == 1) dead += k else m.update(k, c - 1) }
            dead.foreach(m.remove)
        }
      }

    /** Mergeable-summaries rule: add, then subtract the
      * (capacity+1)-th largest count from everything.
      */
    def merge(a: Summary, b: Iterable[(String, Long)], capacity: Int): Summary = {
      b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
      if (a.size > capacity) {
        val thresh = a.values.toArray.sorted(Ordering[Long].reverse).apply(capacity)
        val dead = scala.collection.mutable.ArrayBuffer.empty[String]
        a.foreach { case (k, c) =>
          if (c - thresh <= 0) dead += k else a.update(k, c - thresh)
        }
        dead.foreach(a.remove)
      }
      a
    }

    def sorted(m: Summary): Array[(String, Long)] =
      m.toArray.sortBy { case (k, c) => (-c, k) }
  }

  private final class MisraGries(capacity: Int)
      extends Aggregator[String, scala.collection.mutable.HashMap[String, Long], Array[(String, Long)]] {

    override def zero: scala.collection.mutable.HashMap[String, Long] =
      scala.collection.mutable.HashMap.empty

    override def reduce(
        m: scala.collection.mutable.HashMap[String, Long],
        key: String,
    ): scala.collection.mutable.HashMap[String, Long] = {
      Mg.update(m, key, capacity)
      m
    }

    override def merge(
        a: scala.collection.mutable.HashMap[String, Long],
        b: scala.collection.mutable.HashMap[String, Long],
    ): scala.collection.mutable.HashMap[String, Long] = Mg.merge(a, b, capacity)

    override def finish(m: scala.collection.mutable.HashMap[String, Long]): Array[(String, Long)] =
      Mg.sorted(m)

    override def bufferEncoder: Encoder[scala.collection.mutable.HashMap[String, Long]] =
      Encoders.kryo[scala.collection.mutable.HashMap[String, Long]]
    override def outputEncoder: Encoder[Array[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(String, Long)]]()
  }

  /** Top-`topN` heavy hitters of `keyCol`: (key, approx_count) sorted
    * by count desc then key. One pass, one `capacity`-counter summary
    * per partition merged map-side — the shuffle is O(partitions ×
    * capacity) regardless of key cardinality.
    */
  def heavyHitters(df: DataFrame, keyCol: String, capacity: Int, topN: Int): DataFrame = {
    require(capacity > 0 && topN > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val agg = udaf(new MisraGries(capacity))
    df.select(col(keyCol).cast("string").as("key"))
      .agg(agg(col("key")).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e._1").as("key"), col("e._2").as("approx_count"))
      .orderBy(col("approx_count").desc, col("key"))
      .limit(topN)
  }

  /** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005):
    * a depth×width counter grid; each key increments one counter per
    * row (seeded hash), estimate = min over rows. Estimates NEVER
    * undercount; overcounts are bounded by `2N/width` with
    * probability `1 − 2^−depth`. The grid is a plain `Array[Long]`
    * so per-partition sketches merge by element-wise addition —
    * the shuffle is O(partitions × depth × width) regardless of key
    * cardinality, and two corpora's sketches sum into the union's
    * sketch (the property incremental pipelines need: sketch the
    * daily slice, add into the running corpus sketch, never rescan).
    *
    * Complements [[heavyHitters]]: MG answers "which keys are heavy"
    * in `capacity` counters; CMS answers "how frequent is THIS key"
    * for any later-arriving query key without having kept the key
    * space at all.
    */
  final case class CmsModel(depth: Int, width: Int, seed: Long, table: Array[Long]) {

    private[graft] def bucket(key: String, row: Int): Int = {
      val h = scala.util.hashing.MurmurHash3.stringHash(key, (seed + row).toInt)
      math.floorMod(h, width)
    }

    def estimate(key: String): Long = {
      if (key == null) return 0L
      var best = Long.MaxValue
      var r = 0
      while (r < depth) {
        val c = table(r * width + bucket(key, r))
        if (c < best) best = c
        r += 1
      }
      best
    }

    /** Element-wise sum — sketch(A) + sketch(B) = sketch(A ⊎ B). */
    def merge(other: CmsModel): CmsModel = {
      require(depth == other.depth && width == other.width && seed == other.seed,
        "CMS merge requires identical (depth, width, seed)")
      val out = new Array[Long](table.length)
      var i = 0
      while (i < table.length) { out(i) = table(i) + other.table(i); i += 1 }
      CmsModel(depth, width, seed, out)
    }
  }

  /** Build a CMS over `keyCol` in ONE scan: per-partition grids
    * accumulated locally, `treeAggregate`d by element-wise addition.
    * NULL keys are skipped (they are absent, not a key).
    */
  def countMinSketch(
      df: DataFrame,
      keyCol: String,
      depth: Int = 4,
      width: Int = 1 << 16,
      seed: Long = 42L,
  ): CmsModel = {
    require(depth > 0 && width > 0)
    val proto = CmsModel(depth, width, seed, Array.empty)
    // the grid is built INSIDE each partition (one per partition,
    // allocated there) rather than passed as a treeAggregate zero —
    // a depth×width zero value serializes into every task binary
    // (4 MiB at the defaults), which is pure overhead at scale
    val rdd = df.select(col(keyCol).cast("string")).rdd
    if (rdd.getNumPartitions == 0) return CmsModel(depth, width, seed, new Array(depth * width))
    val table = rdd
      .mapPartitions { it =>
        val t = new Array[Long](depth * width)
        it.foreach { row =>
          if (!row.isNullAt(0)) {
            val key = row.getString(0)
            var r = 0
            while (r < depth) { t(r * width + proto.bucket(key, r)) += 1; r += 1 }
          }
        }
        Iterator.single(t)
      }
      .treeReduce { (a, b) =>
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
    CmsModel(depth, width, seed, table)
  }

  /** Add an `est_count` column — broadcast grid, one probe per row,
    * scan stays columnar. The query side never joins the corpus.
    */
  def cmsEstimates(df: DataFrame, keyCol: String, model: CmsModel): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val estUdf = udf { (k: String) => bc.value.estimate(k) }
    df.withColumn("est_count", estUdf(col(keyCol).cast("string")))
  }

  /** The HyperLogLog register kernels (Flajolet, Fusy, Gandouet &
    * Meunier, AofA 2007) — shared by the whole-frame sketch, the
    * per-group Aggregator, and the streaming state operator. A
    * register array of 2^p bytes answers "how many DISTINCT keys?"
    * to within ~1.04/√2^p relative error; registers merge by
    * element-wise MAX, so per-partition (and per-micro-batch)
    * sketches combine losslessly — the union's sketch is
    * bit-identical however the rows were split. 64-bit hashing
    * (Spark's XXH64, the same kernel behind `xxhash64()`) removes
    * the classic 32-bit large-range correction: 2^(64-p) distinct
    * values saturate nothing at any corpus size we can name.
    *
    * Completes the sketch family: MG ([[heavyHitters]]) = WHICH keys
    * are heavy, CMS ([[countMinSketch]]) = HOW OFTEN is this key,
    * HLL = HOW MANY distinct keys — each in fixed memory.
    */
  private[graft] object Hll {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.types.UTF8String

    /** p ∈ [4, 18]: 16 B to 256 KiB of registers. */
    def checkP(p: Int): Unit =
      require(p >= 4 && p <= 18, s"HLL precision p=$p outside [4, 18]")

    def update(regs: Array[Byte], key: String, p: Int, seed: Long): Unit =
      if (key != null) {
        val h = XXH64.hashUTF8String(UTF8String.fromString(key), seed)
        val idx = (h >>> (64 - p)).toInt
        val w = h << p
        // rank = position of the leftmost 1-bit in the suffix (1-based);
        // an all-zero suffix gets the max rank 64-p+1
        val rank = (if (w == 0L) 65 - p else java.lang.Long.numberOfLeadingZeros(w) + 1).toByte
        if (rank > regs(idx)) regs(idx) = rank
      }

    /** Element-wise max in place: a := max(a, b). */
    def maxMerge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }

    /** Raw-estimate + small-range linear counting (the 2007 paper's
      * recipe; no large-range branch — see object doc). Ranks are
      * ≤ 61 for p ≥ 4, so 2^-rank is an exact long shift.
      */
    def estimate(regs: Array[Byte]): Long = {
      val m = regs.length
      var invSum = 0.0
      var zeros = 0
      var i = 0
      while (i < m) {
        val r = regs(i)
        invSum += 1.0 / (1L << r).toDouble
        if (r == 0) zeros += 1
        i += 1
      }
      val alpha =
        if (m == 16) 0.673
        else if (m == 32) 0.697
        else if (m == 64) 0.709
        else 0.7213 / (1.0 + 1.079 / m)
      val raw = alpha * m.toDouble * m.toDouble / invSum
      val e = if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
      math.rint(e).toLong
    }
  }

  /** A frozen HLL sketch: estimate any time, merge with any other
    * sketch of the same (p, seed) — sketch(A) ∪ sketch(B) =
    * sketch(A ⊎ B) exactly, so incremental pipelines sketch each
    * slice and fold, never rescanning.
    */
  final case class HllModel(p: Int, seed: Long, registers: Array[Byte]) {
    def distinctEstimate: Long = Hll.estimate(registers)

    def merge(other: HllModel): HllModel = {
      require(p == other.p && seed == other.seed,
        "HLL merge requires identical (p, seed)")
      HllModel(p, seed, Hll.maxMerge(registers.clone(), other.registers))
    }
  }

  /** Build an HLL over `keyCol` in ONE scan: per-partition register
    * arrays accumulated locally, `treeReduce`d by element-wise max —
    * the shuffle is O(partitions × 2^p bytes) regardless of key
    * cardinality. NULL keys are skipped (absent, not a key). Same
    * allocate-inside-the-partition discipline as [[countMinSketch]]:
    * a register-sized treeAggregate zero would ride in every task
    * binary for nothing.
    */
  def hyperLogLog(
      df: DataFrame,
      keyCol: String,
      p: Int = 14,
      seed: Long = 42L,
  ): HllModel = {
    Hll.checkP(p)
    val m = 1 << p
    val rdd = df.select(col(keyCol).cast("string")).rdd
    if (rdd.getNumPartitions == 0) return HllModel(p, seed, new Array[Byte](m))
    val regs = rdd
      .mapPartitions { it =>
        val r = new Array[Byte](m)
        it.foreach { row => if (!row.isNullAt(0)) Hll.update(r, row.getString(0), p, seed) }
        Iterator.single(r)
      }
      .treeReduce(Hll.maxMerge)
    HllModel(p, seed, regs)
  }

  private final class HllAgg(p: Int, seed: Long)
      extends Aggregator[String, Array[Byte], Long] {
    override def zero: Array[Byte] = new Array[Byte](1 << p)
    override def reduce(regs: Array[Byte], key: String): Array[Byte] = {
      Hll.update(regs, key, p, seed)
      regs
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = Hll.maxMerge(a, b)
    override def finish(regs: Array[Byte]): Long = Hll.estimate(regs)
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Per-group approximate distinct counts: one 2^p-byte register
    * buffer per group, merged map-side (partial aggregation) — the
    * shuffle is O(groups × 2^p bytes), never per-key rows. The
    * group-scoped sibling of [[hyperLogLog]]; p defaults smaller
    * because every group pays 2^p bytes. Returns
    * (groupCol, distinct_est) sorted by group.
    */
  def hllDistinctByGroup(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      p: Int = 12,
      seed: Long = 42L,
  ): DataFrame = {
    Hll.checkP(p)
    val agg = udaf(new HllAgg(p, seed))
    df.select(col(groupCol), col(keyCol).cast("string").as("__key"))
      .where(col("__key").isNotNull)
      .groupBy(col(groupCol))
      .agg(agg(col("__key")).as("distinct_est"))
      .orderBy(col(groupCol))
  }

  /** KLL quantile sketch (Karnin, Lang & Liberty, FOCS 2016) — the
    * MERGEABLE member of the quantile family. GK (per-group
    * `TextAnalysis.tokenQuantilesApprox`) keeps ε·n rank error in one
    * stream but merges awkwardly; KLL's compactor levels merge by
    * level-wise concatenation + re-compaction, so per-partition (and
    * per-slice) sketches fold with the same guarantees — the shuffle
    * is O(partitions × k), never per-value rows.
    *
    * EXACT regime: with `k ≥ n` no compaction ever fires, the sketch
    * IS the sorted multiset, and quantiles are exact order statistics
    * regardless of merge order — the oracle-checked regime (the same
    * recipe as CMS's collision-free gate). The compaction regime's
    * rank-error bound stays ScalaTest-checked.
    *
    * Quantile convention (both regimes): `quantile(q)` = the element
    * at 1-based index ⌈q·n⌉ of the sorted multiset (the lower
    * empirical quantile) — chosen because SQL replays it exactly via
    * sorted-list indexing, with no interpolation arithmetic to drift
    * cross-engine.
    */
  final class KllBuilder(val k: Int, seed: Long) extends Serializable {
    require(k >= 8, s"k must be ≥ 8: $k")
    private[graft] var levels =
      scala.collection.mutable.ArrayBuffer(scala.collection.mutable.ArrayBuffer.empty[Double])
    private[graft] var n = 0L
    private[graft] var rng: Long = seed ^ 0x9e3779b97f4a7c15L

    /** Deep copy (levels AND coin state) — streaming state must not
      * alias a builder that a failed trigger could half-mutate.
      */
    private[graft] def cloneBuilder(): KllBuilder = {
      val c = new KllBuilder(k, 0L)
      c.levels = levels.map(_.clone())
      c.n = n
      c.rng = rng
      c
    }

    // deterministic coin per compaction (seeded xorshift64*)
    private def nextBit(): Boolean = {
      rng ^= rng << 13; rng ^= rng >>> 7; rng ^= rng << 17
      (rng & 1L) == 1L
    }

    /** capacity shrinks geometrically for LOWER levels (they hold the
      * freshest, least-compacted data): cap(i) = max(2, ⌈k·(2/3)^(H-1-i)⌉)
      * where H = current level count and level H-1 is the top.
      */
    private def capacity(level: Int): Int = {
      val h = levels.length
      math.max(2, math.ceil(k * math.pow(2.0 / 3.0, (h - 1 - level).toDouble)).toInt)
    }

    def update(x: Double): Unit = {
      levels(0) += x
      n += 1
      compress()
    }

    private def totalItems: Int = { var s = 0; levels.foreach(s += _.length); s }

    /** Compact the lowest over-full level: sort, keep a random half
      * (every other element from a coin-chosen offset), promote the
      * kept half one level up. Each survivor's implicit weight
      * doubles — the classic KLL step.
      */
    private def compress(): Unit = {
      var guard = 0
      while (totalItems > levels.indices.map(capacity).sum && guard < 64) {
        val lvl = levels.indices.find(i => levels(i).length > capacity(i)).getOrElse(-1)
        if (lvl < 0) return
        val sorted = levels(lvl).toArray
        java.util.Arrays.sort(sorted)
        val off = if (nextBit()) 1 else 0
        if (lvl + 1 >= levels.length)
          levels += scala.collection.mutable.ArrayBuffer.empty[Double]
        val up = levels(lvl + 1)
        // odd length: the smallest item stays at this level so the
        // compaction covers an even count — promoted weight exactly
        // replaces what left, keeping total weight equal to n (the
        // quantile target denominator). Clearing the whole level on
        // odd counts drifted total weight ±2^lvl per compaction, and
        // for q near 1 the rank scan could run past the end.
        val start = sorted.length % 2
        var i = start + off
        while (i < sorted.length) { up += sorted(i); i += 2 }
        levels(lvl).clear()
        if (start == 1) levels(lvl) += sorted(0)
        guard += 1
      }
    }

    /** Level-wise concatenation + re-compaction: sketch(A) merge
      * sketch(B) carries the union's guarantees.
      */
    def merge(other: KllBuilder): KllBuilder = {
      require(k == other.k, "KLL merge requires identical k")
      while (levels.length < other.levels.length)
        levels += scala.collection.mutable.ArrayBuffer.empty[Double]
      var i = 0
      while (i < other.levels.length) { levels(i) ++= other.levels(i); i += 1 }
      n += other.n
      compress()
      this
    }

    /** The element at 1-based rank ⌈q·n⌉ of the weighted multiset
      * (weight 2^level per item). Exact when no compaction has fired.
      */
    def quantile(q: Double): Double = quantiles(Seq(q)).head

    /** All requested quantiles from ONE flatten+sort (quantile() per
      * q would re-sort the item list each call — k·log k × |qs| of
      * avoidable work on every group).
      */
    def quantiles(qs: Seq[Double]): Seq[Double] = {
      qs.foreach(q => require(q > 0 && q <= 1, s"q must be in (0,1]: $q"))
      require(n > 0, "empty sketch")
      val items = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
      var lvl = 0
      while (lvl < levels.length) {
        val w = 1L << lvl
        levels(lvl).foreach(v => items += ((v, w)))
        lvl += 1
      }
      val sorted = items.sortBy(_._1)
      qs.map { q =>
        val target = math.ceil(q * n).toLong
        var cum = 0L
        var i = 0
        var out = sorted.last._1
        var done = false
        while (i < sorted.length && !done) {
          cum += sorted(i)._2
          if (cum >= target) { out = sorted(i)._1; done = true }
          i += 1
        }
        out
      }
    }
  }

  /** Build a KLL over `valCol` in ONE scan: per-partition builders,
    * `treeReduce` merge — allocate-inside-the-partition discipline as
    * everywhere in this file. NULLs skipped.
    */
  def kllSketch(
      df: DataFrame,
      valCol: String,
      k: Int = 4096,
      seed: Long = 42L,
  ): KllBuilder = {
    val rdd = df.select(col(valCol).cast("double")).rdd
    val partials = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        // partition-salted seed: two partitions must not replay the
        // same coin sequence (their compactions are independent draws)
        val b = new KllBuilder(k, seed + pid)
        it.foreach(row => if (!row.isNullAt(0)) b.update(row.getDouble(0)))
        if (b.n == 0) Iterator.empty else Iterator.single(b)
      }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out =
      if (partials.isEmpty()) new KllBuilder(k, seed)
      else partials.treeReduce((a, b) => a.merge(b))
    partials.unpersist(blocking = false)
    out
  }

  /** Per-group quantiles via one pass of bounded per-group state
    * (`mapGroups` feeds each group's rows through one builder).
    * Returns (group, q1, q2, …) sorted by group; column names are
    * `"q" + percent` (q25, q50, …).
    */
  def kllQuantilesByGroup(
      df: DataFrame,
      groupCol: String,
      valCol: String,
      qs: Seq[Double],
      k: Int = 4096,
      seed: Long = 42L,
  ): DataFrame = {
    require(qs.nonEmpty)
    // output columns are q<percent>; two quantiles rounding to the
    // same percent would silently overwrite each other downstream
    require(qs.map(q => math.round(q * 100)).distinct.length == qs.length,
      s"quantiles collide on q<percent> column names: $qs")
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df
      .select(col(groupCol).cast("string"), col(valCol).cast("double"))
      .where(col(groupCol).isNotNull && col(valCol).isNotNull)
      .as[(String, Double)]
    val rows = keyed
      .groupByKey(_._1)
      .mapGroups { (g, it) =>
        val b = new KllBuilder(k, seed ^ g.hashCode.toLong)
        it.foreach { case (_, v) => b.update(v) }
        (g, b.quantiles(qs))
      }
    val out = rows.toDF(groupCol, "__qs")
    qs.zipWithIndex
      .foldLeft(out) { case (d, (q, i)) =>
        d.withColumn(s"q${math.round(q * 100)}", col("__qs").getItem(i))
      }
      .drop("__qs")
      .orderBy(groupCol)
  }

  /** SQL faces: `hll_distinct(key)` (approximate COUNT(DISTINCT) in
    * 2^p bytes of aggregation state) and `heavy_hitters(key)` (the
    * Misra-Gries summary as array<struct<key,count>>), so SQL-only
    * users get the sketch family without leaving `spark.sql` — both
    * are partial-aggregating UDAFs, so map-side combine applies
    * exactly as in the DataFrame faces.
    */
  def registerSql(
      spark: org.apache.spark.sql.SparkSession,
      hllP: Int = 12,
      hllSeed: Long = 42L,
      mgCapacity: Int = 64,
  ): Unit = {
    Hll.checkP(hllP)
    spark.udf.register("hll_distinct", udaf(new HllAgg(hllP, hllSeed)))
    spark.udf.register("heavy_hitters", udaf(new MisraGries(mgCapacity)))
  }

  /** Key-distribution skew profile of `keyCol` — the exact diagnostic
    * run before a join/groupBy at scale: top-`topN` heaviest keys with
    * their share of all rows and the ratio to a uniform key's
    * expected share (`skew_factor` ≫ 1 ⇒ salt this key or AQE will
    * split it). Exact aggregation (it IS a groupBy — use
    * [[heavyHitters]] when even that is too expensive); deterministic,
    * oracle-checkable.
    */
  def keySkewProfile(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    val counts = df
      .groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(
      sum(col("cnt")).as("total"),
      count(lit(1)).as("n_keys"),
    )
    counts
      .crossJoin(broadcast(totals))
      .select(
        col("key"),
        col("cnt"),
        (col("cnt").cast("double") / col("total")).as("share"),
        (col("cnt").cast("double") * col("n_keys") / col("total")).as("skew_factor"),
      )
      .orderBy(col("cnt").desc, col("key"))
      .limit(topN)
  }
}
