package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Corpus-scale embedding clustering — spherical k-means over an
  * `Array[Float]` embedding column.
  *
  * This is the domain-clustering operator a training-data pipeline
  * uses to partition a corpus by topic before choosing mixture
  * weights (the cluster assignments feed [[Sampling.mixtureSample]] /
  * [[Packing.interleave]]), and the same model family the ANN index
  * ([[Similarity.trainIvf]]) builds on — but trained to convergence
  * over the FULL corpus, not just a driver-side sample:
  *
  *   - init: the sampled driver k-means the IVF trainer already
  *     implements (deterministic reservoir + Lloyd, tiny);
  *   - refine: Lloyd iterations where each pass is ONE distributed
  *     scan — centroids broadcast out, per-partition partial sums
  *     `treeAggregate`d back (k·dim doubles per partition, no
  *     shuffle of the corpus itself, map-side combine by
  *     construction).
  *
  * At 100 TB each iteration reads the corpus once and moves only
  * k·dim·8 bytes per partition over the network; the corpus never
  * shuffles. The projected vector column is persisted for the
  * duration of the iterations and released before return (the
  * round-7 cache-ownership convention: operators pin nothing for the
  * caller).
  *
  * Geometry is cosine (vectors normalized before accumulation,
  * centroid = normalized mean direction) to match the rest of the
  * embedding family ([[Similarity]] cosine top-k / SemDeDup ε-balls).
  */
object Clustering {

  /** Spherical k-means model: unit-norm centroid directions.
    * Assignment is by maximum cosine (ties → lowest index,
    * deterministic).
    */
  final case class KmeansModel(centroids: Array[Array[Float]]) {
    def k: Int = centroids.length
    def nearestCentroid(v: Array[Float]): Int = Similarity.IvfModel.nearest(centroids, v)
  }

  /** Cosine distance on normalized vectors — the single kernel every
    * k-center face shares (the two faces must agree bit-for-bit on
    * the same candidates). The width check costs one branch per call
    * and turns a ragged corpus row into a named error instead of an
    * out-of-bounds crash or a silently-truncated dot product.
    */
  private def cosDist(a: Array[Float], b: Array[Float]): Double = {
    require(a.length == b.length, s"ragged vector width: ${a.length} vs ${b.length}")
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i); i += 1 }
    1.0 - s
  }

  /** Seeded uniform in [0,1) from an id — pure function of
    * (id, seed), so samples are rerunnable and layout-independent.
    */
  private def seededUniform(id: Long, seed: Long): Double = {
    val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(id, seed)
    ((h >>> 11) + 0.5) / (1L << 53).toDouble
  }

  private def normalize(v: Array[Float]): Array[Float] = {
    var ss = 0.0
    v.foreach(x => ss += x.toDouble * x)
    val n = math.sqrt(ss)
    if (n == 0) v else v.map(x => (x / n).toFloat)
  }

  /** Train spherical k-means: sampled-init (via [[Similarity.trainIvf]],
    * deterministic) then `iterations` full-corpus Lloyd passes. Empty
    * corpus → degenerate single-centroid model (assignment then maps
    * everything to cluster 0 instead of crashing — an empty slice is
    * routine at scale). k is capped by the init sample size.
    */
  def trainKmeans(
      df: DataFrame,
      vecCol: String,
      k: Int,
      iterations: Int = 8,
      initSampleRows: Int = 20000,
      seed: Long = 42L,
  ): KmeansModel = {
    val init =
      Similarity.trainIvf(df, vecCol, nlist = k, sampleRows = initSampleRows,
        iterations = 2, seed = seed)
    var centroids = init.centroids
    if (centroids.isEmpty) return KmeansModel(centroids) // empty corpus (explicit marker)
    val dim = centroids.head.length
    val sc = df.sparkSession.sparkContext
    // one projection, persisted across the iterations (each pass is a
    // re-scan otherwise; at corpus scale MEMORY_AND_DISK spills rather
    // than evicting hot executor memory). NULL / zero-length embedding
    // rows are skipped, matching kCenterGreedy and Whitening.moments —
    // a handful of malformed rows must not fail corpus-scale training.
    val vecs = df.select(col(vecCol))
      .where(col(vecCol).isNotNull && size(col(vecCol)) > 0)
      .rdd
      .map(r => normalize(r.getSeq[Float](0).toArray))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var it = 0
      while (it < iterations) {
        val bc = sc.broadcast(centroids)
        val kk = centroids.length
        val (sums, counts) = vecs.treeAggregate(
          (Array.fill(kk)(new Array[Double](dim)), new Array[Long](kk)))(
          seqOp = { case ((s, n), v) =>
            val c = Similarity.IvfModel.nearest(bc.value, v)
            n(c) += 1
            var i = 0
            while (i < dim) { s(c)(i) += v(i); i += 1 }
            (s, n)
          },
          combOp = { case ((s1, n1), (s2, n2)) =>
            var c = 0
            while (c < kk) {
              n1(c) += n2(c)
              var i = 0
              while (i < dim) { s1(c)(i) += s2(c)(i); i += 1 }
              c += 1
            }
            (s1, n1)
          },
        )
        centroids = centroids.indices.map { c =>
          if (counts(c) == 0) centroids(c) // empty cell keeps its direction
          else normalize(sums(c).map(x => (x / counts(c)).toFloat))
        }.toArray
        bc.destroy()
        it += 1
      }
      KmeansModel(centroids)
    } finally vecs.unpersist(blocking = false)
  }

  /** Add a `cluster` column (nearest-centroid index) — broadcast
    * model, one narrow map, scan stays columnar. NULL/empty vectors
    * land in cluster 0 deterministically.
    */
  def assignClusters(
      df: DataFrame,
      vecCol: String,
      model: KmeansModel,
      outCol: String = "cluster",
  ): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model.centroids)
    val assignUdf = udf { (v: Array[Float]) =>
      if (v == null) 0 else Similarity.IvfModel.nearest(bc.value, v)
    }
    df.withColumn(outCol, assignUdf(col(vecCol)))
  }

  /** Per-cluster profile for mixture design: size and cohesion
    * (mean/min cosine to the assigned centroid). One assignment pass
    * + one aggregation — the same shape as any groupBy rollup.
    */
  def clusterProfile(
      df: DataFrame,
      vecCol: String,
      model: KmeansModel,
  ): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model.centroids)
    val simUdf = udf { (v: Array[Float], c: Int) =>
      if (v == null) 0.0 else -Similarity.IvfModel.negCos(bc.value(c), v)
    }
    assignClusters(df, vecCol, model)
      .withColumn("__sim", simUdf(col(vecCol), col("cluster")))
      .groupBy("cluster")
      .agg(
        count(lit(1)).as("n"),
        avg(col("__sim")).as("mean_cosine"),
        min(col("__sim")).as("min_cosine"),
      )
      .orderBy("cluster")
  }

  /** Model-selection sweep over k: one row per candidate k with the
    * two standard diagnostics —
    *
    *   - `inertia`: mean cosine distance to the assigned centroid
    *     (the elbow curve's y-axis);
    *   - `silhouette`: mean SIMPLIFIED silhouette
    *     `(b − a) / max(a, b)` with `a` = distance to the own
    *     centroid and `b` = distance to the nearest OTHER centroid
    *     (Hruschka et al. 2004) — centroid distances instead of
    *     pairwise, so the cost is O(n·k) per sweep point in ONE scan
    *     instead of the O(n²) of the exact silhouette, which no
    *     100 TB corpus can pay;
    *
    * plus `is_best` marking the silhouette argmax (ties → lowest k,
    * deterministic).
    *
    * Scale shape: the projected vector column is persisted once and
    * shared by every sweep point; each k costs `iterations + 1`
    * corpus scans (Lloyd passes + the diagnostic pass), and the only
    * driver-side state is |ks| metric triples. The sweep is a driver
    * loop BY DESIGN: points are trained sequentially so their scans
    * share the one cached projection rather than competing for
    * memory.
    *
    * `ks` must all be ≥ 2 (silhouette is undefined at k = 1 — the
    * elbow value there is just total variance). Points whose vector
    * is NULL/empty are skipped, matching [[trainKmeans]]. An empty
    * corpus yields an empty result.
    */
  def kSweep(
      df: DataFrame,
      vecCol: String,
      ks: Seq[Int],
      iterations: Int = 6,
      initSampleRows: Int = 20000,
      seed: Long = 42L,
  ): DataFrame = {
    require(ks.nonEmpty, "ks must be non-empty")
    require(ks.forall(_ >= 2), s"every swept k must be >= 2: $ks")
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df
      .select(col(vecCol))
      .where(col(vecCol).isNotNull && size(col(vecCol)) > 0)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val metrics = ks.distinct.sorted.flatMap { k =>
        val model = trainKmeans(vecs, vecCol, k, iterations, initSampleRows, seed)
        // fewer than 2 trained centroids (empty corpus, or a 1-row
        // init sample capping k) → silhouette is undefined at this
        // sweep point: skip it rather than let the nearest-other
        // sentinel masquerade as a perfect score
        if (model.centroids.length < 2) None
        else {
          val bc = spark.sparkContext.broadcast(model.centroids)
          // (a, b) = cosine distance to own / nearest-other centroid;
          // vectors normalized to match the training geometry.
          val abUdf = udf { (v: Array[Float]) =>
            val cs = bc.value
            val x = normalize(v)
            var best = Double.MaxValue
            var second = Double.MaxValue
            var i = 0
            while (i < cs.length) {
              val d = cosDist(cs(i), x)
              if (d < best) { second = best; best = d }
              else if (d < second) second = d
              i += 1
            }
            (best, second)
          }
          val row = vecs
            .select(abUdf(col(vecCol)).as("ab"))
            .agg(
              count(lit(1)).as("n"),
              avg(col("ab._1")).as("inertia"),
              avg(
                when(greatest(col("ab._1"), col("ab._2")) > 0,
                  (col("ab._2") - col("ab._1")) / greatest(col("ab._1"), col("ab._2")))
                  .otherwise(lit(0.0))).as("silhouette"),
            )
            .head()
          bc.destroy() // one live broadcast per sweep point otherwise
          Some((k, row.getLong(0), row.getDouble(1), row.getDouble(2)))
        }
      }
      if (metrics.isEmpty) return Seq.empty[(Int, Long, Double, Double, Boolean)]
        .toDF("k", "n", "inertia", "silhouette", "is_best")
      val bestK = metrics.maxBy { case (k, _, _, sil) => (sil, -k) }._1
      metrics
        .map { case (k, n, inertia, sil) => (k, n, inertia, sil, k == bestK) }
        .toDF("k", "n", "inertia", "silhouette", "is_best")
    } finally vecs.unpersist(blocking = false)
  }

  /** Greedy k-center (farthest-point) coreset selection — the
    * diversity-maximizing counterpart of the density operators:
    * SemDeDup removes what's redundant, k-center KEEPS what's spread
    * out (coreset construction / "select k maximally diverse
    * exemplars", Gonzalez 1985 — the classic 2-approximation of the
    * optimal k-center cover).
    *
    * Seed = the row with the minimum id (deterministic, not
    * data-dependent); each round picks the point farthest (cosine
    * distance) from everything chosen so far, ties broken by lowest
    * id — the selection is a pure function of the input set.
    *
    * Scale shape: k rounds, each ONE corpus scan — a broadcast of the
    * newly-chosen vector out, one (dist, id) pair back per partition
    * via `reduce`; the corpus never shuffles, and the running
    * min-distance column is updated in place on a persisted
    * (id, vec, dist) RDD (previous round unpersisted as soon as the
    * next is materialized). Linear-in-k lineage on an RDD is flat
    * maps, not Catalyst plans — no plan-walk blowup (the landmine
    * that bit DataFrame CC) — but keep k in the thousands, not
    * millions: this is an exemplar selector, not a sampler.
    *
    * Returns (id, pick_order, dist_at_pick): `dist_at_pick` of round
    * r is the coverage radius of the first r centers — its tail value
    * is the standard coreset-quality diagnostic. Stops early when
    * everything is exactly covered (dist 0 — duplicate-only residue).
    */
  def kCenterGreedy(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
  ): DataFrame = {
    require(k > 0, s"k must be > 0: $k")
    val spark = df.sparkSession
    import spark.implicits._
    val sc = spark.sparkContext

    val base = df
      .select(col(idCol).cast("long").as("id"), col(vecCol))
      .where(col("id").isNotNull && col(vecCol).isNotNull)
      .rdd
      .map(r => (r.getLong(0), normalize(r.getSeq[Float](1).toArray)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    if (base.isEmpty()) {
      base.unpersist(blocking = false)
      return Seq.empty[(Long, Int, Double)].toDF(idCol, "pick_order", "dist_at_pick")
    }
    val seedRow = base.reduce((a, b) => if (a._1 <= b._1) a else b)
    val chosen = scala.collection.mutable.ArrayBuffer((seedRow._1, 0, 0.0))
    val bcSeed = sc.broadcast(seedRow._2)
    var cur = base
      .map { case (id, v) => (id, v, cosDist(v, bcSeed.value)) }
      .persist(StorageLevel.MEMORY_AND_DISK)
    cur.count()
    base.unpersist(blocking = false)
    var round = 1
    var done = false
    while (round < k && !done) {
      // farthest uncovered point; chosen points sit at dist 0 so they
      // can't win while anything uncovered remains
      val best = cur.reduce { (a, b) =>
        if (a._3 > b._3 || (a._3 == b._3 && a._1 < b._1)) a else b
      }
      if (best._3 <= 0.0) done = true // exact cover: only duplicates left
      else {
        chosen += ((best._1, round, best._3))
        val bcV = sc.broadcast(best._2)
        // NOTE: broadcasts stay alive for the loop's duration — a lost
        // persisted block recomputes through every prior round's map
        val next = cur
          .map { case (id, v, d) =>
            val nd = cosDist(v, bcV.value)
            (id, v, if (nd < d) nd else d)
          }
          .persist(StorageLevel.MEMORY_AND_DISK)
        next.count()
        cur.unpersist(blocking = false)
        cur = next
        round += 1
      }
    }
    cur.unpersist(blocking = false)
    chosen.toSeq.toDF(idCol, "pick_order", "dist_at_pick")
  }

  /** Scale path for [[kCenterGreedy]]: exact greedy pays k sequential
    * corpus scans (its contract — fine for hundreds of exemplars,
    * wrong for tens of thousands). This variant adapts k-means||
    * oversampling (Bahmani et al., VLDB 2012) to k-center: a FIXED
    * number of rounds each samples ~(oversample·k)/rounds candidates
    * with probability ∝ dist² to the running candidate set (seeded
    * per-id uniforms — rerunnable, layout-independent), then the
    * driver runs exact greedy k-center over the O(oversample·k)
    * candidates. ~2 scans per round regardless of k; the candidate
    * set is provably dense near far-out regions (the dist² bias), so
    * the coverage radius lands near exact-greedy's in practice —
    * the approximation trade is documented, not hidden.
    */
  def kCenterOversampled(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      oversample: Int = 8,
      rounds: Int = 5,
      seed: Long = 42L,
  ): DataFrame = {
    require(k > 0 && oversample > 0 && rounds > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val sc = spark.sparkContext

    val base = df
      .select(col(idCol).cast("long").as("id"), col(vecCol))
      .where(col("id").isNotNull && col(vecCol).isNotNull)
      .rdd
      .map(r => (r.getLong(0), normalize(r.getSeq[Float](1).toArray)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    if (base.isEmpty()) {
      base.unpersist(blocking = false)
      return Seq.empty[(Long, Int, Double)].toDF(idCol, "pick_order", "dist_at_pick")
    }
    val seedRow = base.reduce((a, b) => if (a._1 <= b._1) a else b)
    val candidates = scala.collection.mutable.LinkedHashMap(seedRow._1 -> seedRow._2)
    val bcSeed = sc.broadcast(seedRow._2)
    var cur = base
      .map { case (id, v) => (id, v, cosDist(v, bcSeed.value)) }
      .persist(StorageLevel.MEMORY_AND_DISK)
    cur.count()
    base.unpersist(blocking = false)
    val perRound = math.max(1.0, oversample.toDouble * k / rounds)
    var r = 0
    while (r < rounds && candidates.size < oversample * k) {
      val sumSq = cur.map(t => t._3 * t._3).reduce(_ + _)
      if (sumSq > 0) {
        // round-salted uniforms: a point skipped this round can still
        // be drawn in a later one once its neighborhood stays far
        val roundSeed = seed + 1 + r
        val picked = cur
          .filter { case (id, _, d) =>
            seededUniform(id, roundSeed) < perRound * d * d / sumSq
          }
          .collect()
        picked.foreach { case (id, v, _) => candidates.getOrElseUpdate(id, v) }
        if (picked.nonEmpty) {
          val bcNew = sc.broadcast(picked.map(_._2))
          val next = cur
            .map { case (id, v, d) =>
              var best = d
              val arr = bcNew.value
              var i = 0
              while (i < arr.length) {
                val nd = cosDist(v, arr(i))
                if (nd < best) best = nd
                i += 1
              }
              (id, v, best)
            }
            .persist(StorageLevel.MEMORY_AND_DISK)
          next.count()
          cur.unpersist(blocking = false)
          cur = next
        }
      }
      r += 1
    }
    cur.unpersist(blocking = false)
    // exact greedy over the candidate set, on the driver
    val cand = candidates.toArray
    val chosen = scala.collection.mutable.ArrayBuffer((seedRow._1, 0, 0.0))
    val dist = cand.map { case (_, v) => cosDist(v, seedRow._2) }
    var round = 1
    var done = false
    while (round < k && !done) {
      var bi = -1
      var bd = -1.0
      var i = 0
      while (i < cand.length) {
        if (dist(i) > bd || (dist(i) == bd && bi >= 0 && cand(i)._1 < cand(bi)._1)) {
          bd = dist(i); bi = i
        }
        i += 1
      }
      if (bd <= 0.0) done = true
      else {
        chosen += ((cand(bi)._1, round, bd))
        val cv = cand(bi)._2
        i = 0
        while (i < cand.length) {
          val nd = cosDist(cand(i)._2, cv)
          if (nd < dist(i)) dist(i) = nd
          i += 1
        }
        round += 1
      }
    }
    chosen.toSeq.toDF(idCol, "pick_order", "dist_at_pick")
  }
}
