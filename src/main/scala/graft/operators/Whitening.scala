package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding whitening (PCA / ZCA) — the standard preprocessing step
  * before cosine-geometry corpus work (SemDeDup-style dedup, k-means
  * domain clustering, ANN indexing): decorrelate the dimensions and
  * equalize their variance so distances stop being dominated by a few
  * high-variance directions.
  *
  * Scale shapes (100 TB):
  *   - fitting is ONE corpus scan: per-partition (n, Σx, Σxxᵀ)
  *     accumulated locally and `treeReduce`-summed — d + d² doubles
  *     per partition move, the vectors never shuffle. The
  *     eigendecomposition runs on the driver over the d×d covariance
  *     (d is the embedding width, hundreds at most — microseconds).
  *   - transforming is a broadcast d×d mat-vec per row — a pure
  *     projection, shuffle-free, streams at scan speed.
  *
  * Float-parity note: partial covariance sums combine in tree order,
  * so refitting under a different partitioning can move the model by
  * ulps — all contracts here are tolerance-based (near-identity
  * covariance), never bit-exact across layouts.
  */
object Whitening {

  /** Hard width bound for [[moments]]: each partition accumulates a
    * dense d×d double partial (d²·8 bytes — 33 MB at d=2048) and the
    * treeReduce moves one per partition. At d=4096 that is 134 MB per
    * partial, which silently turns the "cheap" fit into an
    * executor-memory hazard — so width is REJECTED up front with a
    * named error instead. For wider embeddings, reduce first
    * (dimensionality reduction / [[Similarity.trainOpq]]-style
    * subspace treatment) or fit on a projected slice; see SCALE.md.
    */
  val MaxMomentsDim = 2048

  /** One-pass first+second moments of an `Array[Float]` column:
    * (rowCount, mean, population covariance). Accumulators are
    * allocated INSIDE each partition (a d²-sized treeAggregate zero
    * would ride in every task binary — same discipline as
    * [[Sketches.countMinSketch]]). Width is bounded by
    * [[MaxMomentsDim]].
    */
  def moments(df: DataFrame, vecCol: String): (Long, Array[Double], Array[Array[Double]]) = {
    val rdd = df.select(col(vecCol)).rdd
    val partials = rdd
      .mapPartitions { it =>
        var n = 0L
        var sum: Array[Double] = null
        var outer: Array[Double] = null // row-major d×d
        it.foreach { row =>
          if (!row.isNullAt(0)) {
            // .toArray BEFORE the d² inner loop: the repo-wide kernel
            // convention (SCALE.md "UDF vector parameters") — getSeq
            // hands back a boxed ArraySeq, and indexing it inside the
            // covariance loop pays a box per multiply
            val v = row.getSeq[Float](0).toArray
            val d = v.length
            require(d <= MaxMomentsDim,
              s"embedding width $d exceeds Whitening.MaxMomentsDim ($MaxMomentsDim): " +
                s"the dense d×d covariance partial would be ${d.toLong * d * 8 / (1 << 20)} MB " +
                "per partition — reduce dimensionality before whitening (see SCALE.md)")
            if (sum == null) { sum = new Array[Double](d); outer = new Array[Double](d * d) }
            require(v.length == sum.length, s"ragged vector width: ${v.length} vs ${sum.length}")
            n += 1
            var i = 0
            while (i < d) {
              val xi = v(i).toDouble
              sum(i) += xi
              var j = 0
              while (j < d) { outer(i * d + j) += xi * v(j).toDouble; j += 1 }
              i += 1
            }
          }
        }
        if (n == 0) Iterator.empty else Iterator.single((n, sum, outer))
      }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // an all-empty partition set gives treeReduce nothing to reduce —
    // degrade to the documented empty-corpus result instead of throwing
    if (partials.isEmpty()) {
      partials.unpersist(blocking = false)
      return (0L, Array.empty, Array.empty)
    }
    val agg = partials.treeReduce { (a, b) =>
      require(a._2.length == b._2.length,
        s"ragged vector width across partitions: ${a._2.length} vs ${b._2.length}")
      var i = 0
      while (i < a._2.length) { a._2(i) += b._2(i); i += 1 }
      var j = 0
      while (j < a._3.length) { a._3(j) += b._3(j); j += 1 }
      (a._1 + b._1, a._2, a._3)
    }
    partials.unpersist(blocking = false)
    val (n, sum, outer) = agg
    val d = sum.length
    val mean = sum.map(_ / n)
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) { cov(i)(j) = outer(i * d + j) / n - mean(i) * mean(j); j += 1 }
      i += 1
    }
    (n, mean, cov)
  }

  /** A fitted whitening transform y = W(x − mean). `eigenvalues` are
    * the covariance spectrum (descending) for rank diagnostics:
    * dimensions with λ ≲ eps·λmax carry no signal and come out
    * near-zero, not blown up — the eps floor inside 1/√(λ+eps·λmax)
    * is what keeps null directions from amplifying float noise.
    */
  final case class WhiteningModel(
      mean: Array[Double],
      basis: Array[Array[Double]], // row-major W, d×d
      eigenvalues: Array[Double],
      eps: Double,
  ) {
    def dim: Int = mean.length

    def transformOne(v: Array[Float]): Array[Float] = {
      // named width check, matching the fit path's ragged-vector
      // policy: a LONGER vector would silently whiten its first dim
      // components into plausible garbage, a shorter one would throw
      // a bare IndexOutOfBounds
      require(v.length == dim,
        s"whitening transform: vector width ${v.length} != model dim $dim")
      val d = dim
      val centered = new Array[Double](d)
      var i = 0
      while (i < d) { centered(i) = v(i).toDouble - mean(i); i += 1 }
      val out = new Array[Float](d)
      i = 0
      while (i < d) {
        val row = basis(i)
        var s = 0.0
        var j = 0
        while (j < d) { s += row(j) * centered(j); j += 1 }
        out(i) = s.toFloat
        i += 1
      }
      out
    }
  }

  /** Fit PCA whitening (or ZCA with `zca = true`: W rotated back into
    * the input basis, the minimum-distortion whitener) from one
    * moments pass + a driver-side symmetric eigendecomposition.
    */
  def fit(
      df: DataFrame,
      vecCol: String,
      eps: Double = 1e-6,
      zca: Boolean = false,
  ): WhiteningModel = {
    require(eps > 0, s"eps must be > 0: $eps")
    val (n, mean, cov) = moments(df, vecCol)
    require(n > 0, "cannot fit whitening on an empty corpus")
    val d = mean.length
    val mB = breeze.linalg.DenseMatrix.tabulate(d, d)((i, j) => cov(i)(j))
    val es = breeze.linalg.eigSym(mB) // ascending eigenvalues, orthonormal columns
    val lamMax = math.max(es.eigenvalues(d - 1), 0.0)
    // the floor must never underflow to 0.0 (eps·MinPositiveValue
    // does), or an all-zero covariance — one row, identical vectors —
    // yields 1/√0 = Inf basis entries and NaN outputs
    val floor = math.max(eps * lamMax, Double.MinPositiveValue)
    // descending order for the caller-facing spectrum
    val order = (0 until d).sortBy(i => -es.eigenvalues(i))
    val invSqrt = order.map(i => 1.0 / math.sqrt(math.max(es.eigenvalues(i), 0.0) + floor))
    // W_pca(r, :) = invSqrt(r) · u_rᵀ
    val wPca = Array.tabulate(d, d)((r, c) => invSqrt(r) * es.eigenvectors(c, order(r)))
    val w =
      if (!zca) wPca
      else {
        // W_zca = U Λ^{-1/2} Uᵀ = Uᵀ-weighted recombination of wPca rows
        Array.tabulate(d, d) { (r, c) =>
          var s = 0.0
          var k = 0
          while (k < d) { s += es.eigenvectors(r, order(k)) * wPca(k)(c); k += 1 }
          s
        }
      }
    WhiteningModel(mean, w, order.map(i => es.eigenvalues(i)).toArray, eps)
  }

  /** Add `outCol` = W(x − mean) as `Array[Float]` — broadcast model,
    * one narrow map, no shuffle. NULL vectors stay NULL.
    */
  def transform(
      df: DataFrame,
      vecCol: String,
      model: WhiteningModel,
      outCol: String = "white",
  ): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val t = udf { (v: Array[Float]) => if (v == null) null else bc.value.transformOne(v) }
    df.withColumn(outCol, t(col(vecCol)))
  }
}
