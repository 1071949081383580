package graft.operators

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity.{IvfModel, OpqModel, PqModel}
import graft.operators.Clustering.KmeansModel

/** Durable storage for the ANN / clustering index models — the
  * train-once-reuse-everywhere contract at corpus scale: an IVF/PQ/OPQ
  * codebook or k-means model is trained from one bounded sample pass
  * and then reused across every ingest increment, search job, and
  * cluster restart; retraining per run both wastes a corpus scan and
  * silently CHANGES cell/code assignments (two runs of the same
  * pipeline would disagree about which cell a vector lives in — fatal
  * for any persisted inverted file or incremental index).
  *
  * Format: plain parquet (one directory per model). Floats travel as
  * binary parquet floats, so save→load is bit-exact — a loaded model
  * reproduces the original's assignments and search results
  * exactly (IndexStoreSpec locks roundtrip equality and
  * result-for-result search agreement). Parquet over JSON because
  * it needs zero parsing code, keeps float bits exact by
  * construction, is inspectable by any engine (including the DuckDB
  * oracle if ever needed), and rides the same storage layer as every
  * other pipeline artifact.
  *
  * Layout: `centroids` rows (idx, vec) for IVF/k-means; a 1-row
  * `meta` frame for PQ/OPQ scalars + flat arrays. Driver-sized data
  * only (codebooks are KBs-to-MBs); the writes coalesce(1) so a model
  * is one file plus parquet footer — no tiny-file spray.
  */
object IndexStore {

  // ------------------------------------------------- hot-path binary codec
  //
  // r22 (guide §5 — the driver should do almost no data work, and a
  // KB-sized model is not data): the IVF/PQ/OPQ artifacts are written
  // and re-read on EVERY store write, reopen, and epoch compaction,
  // and each parquet roundtrip was a full Spark job (~0.15 s of
  // scheduling + commit per call — several seconds per lifecycle gate,
  // and a real per-epoch tax at scale). These three hot artifacts now
  // move through plain Hadoop filesystem streams on the driver: raw
  // float BITS (floatToRawIntBits), so the roundtrip stays bit-exact
  // (IndexStoreSpec's roundtrip locks hold unchanged). Loads fall back
  // to the parquet layout for stores written by earlier versions.
  // The store's `meta` frame deliberately STAYS a Spark parquet write:
  // its job-commit `_SUCCESS` marker is the epoch-completeness signal
  // the compaction protocol trusts. Model files land BEFORE meta, so
  // a crash mid-model-write leaves an incomplete epoch exactly as
  // before. The cold models below (kmeans/hashidf/dsir/lm/bpe/pool)
  // are fit-once artifacts, not per-epoch traffic — they keep the
  // engine-inspectable parquet layout.

  private val BinMagic = 0x47524654 // "GRFT"

  private def withBinOut(spark: SparkSession, path: String)(
      f: java.io.DataOutputStream => Unit): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(fs.create(p, true)))
    try { out.writeInt(BinMagic); out.writeInt(1); f(out) } finally out.close()
  }

  /** Some(result) when the binary file exists, None → parquet fallback. */
  private def withBinIn[T](spark: SparkSession, path: String)(
      f: java.io.DataInputStream => T): Option[T] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(fs.open(p)))
      try {
        require(in.readInt() == BinMagic && in.readInt() == 1,
          s"IndexStore: $path is not a v1 graft model file")
        Some(f(in))
      } finally in.close()
    }
  }

  private def writeFloats(out: java.io.DataOutputStream, v: Array[Float]): Unit = {
    out.writeInt(v.length)
    var i = 0
    while (i < v.length) { out.writeInt(java.lang.Float.floatToRawIntBits(v(i))); i += 1 }
  }

  private def readFloats(in: java.io.DataInputStream): Array[Float] = {
    val n = in.readInt()
    val v = new Array[Float](n)
    var i = 0
    while (i < n) { v(i) = java.lang.Float.intBitsToFloat(in.readInt()); i += 1 }
    v
  }

  private def writeVectors(
      spark: SparkSession,
      path: String,
      rows: Array[Array[Float]],
  ): Unit =
    withBinOut(spark, s"$path.bin") { out =>
      out.writeInt(rows.length)
      rows.foreach(writeFloats(out, _))
    }

  private def readVectors(spark: SparkSession, path: String): Array[Array[Float]] =
    withBinIn(spark, s"$path.bin") { in =>
      Array.fill(in.readInt())(readFloats(in))
    }.getOrElse {
      // parquet fallback: store written before the binary codec
      spark.read
        .parquet(path)
        .orderBy("idx")
        .collect()
        .map(_.getSeq[Float](1).toArray)
    }

  def saveIvf(spark: SparkSession, model: IvfModel, path: String): Unit =
    writeVectors(spark, s"$path/centroids", model.centroids)

  def loadIvf(spark: SparkSession, path: String): IvfModel =
    IvfModel(readVectors(spark, s"$path/centroids"))

  def saveKmeans(spark: SparkSession, model: KmeansModel, path: String): Unit =
    writeVectors(spark, s"$path/centroids", model.centroids)

  def loadKmeans(spark: SparkSession, path: String): KmeansModel =
    KmeansModel(readVectors(spark, s"$path/centroids"))

  def savePq(spark: SparkSession, model: PqModel, path: String): Unit =
    withBinOut(spark, s"$path/pq.bin") { out =>
      out.writeInt(model.m); out.writeInt(model.ksub); out.writeInt(model.dsub)
      writeFloats(out, model.codebooks)
    }

  def loadPq(spark: SparkSession, path: String): PqModel =
    withBinIn(spark, s"$path/pq.bin") { in =>
      PqModel(in.readInt(), in.readInt(), in.readInt(), readFloats(in))
    }.getOrElse {
      val r = spark.read.parquet(s"$path/pq").head()
      PqModel(r.getInt(0), r.getInt(1), r.getInt(2), r.getSeq[Float](3).toArray)
    }

  def saveOpq(spark: SparkSession, model: OpqModel, path: String): Unit = {
    withBinOut(spark, s"$path/rotation.bin") { out =>
      out.writeInt(model.dim)
      writeFloats(out, model.r)
    }
    savePq(spark, model.pq, path)
  }

  def loadOpq(spark: SparkSession, path: String): OpqModel =
    withBinIn(spark, s"$path/rotation.bin") { in =>
      OpqModel(in.readInt(), readFloats(in), loadPq(spark, path))
    }.getOrElse {
      val rot = spark.read.parquet(s"$path/rotation").head()
      OpqModel(rot.getInt(0), rot.getSeq[Float](1).toArray, loadPq(spark, path))
    }

  /** Persist a frozen [[TextAnalysis.HashIdfModel]] — the hashing
    * parameters travel WITH the statistics (a model applied under
    * different ngrams/seed would weight a different space; load
    * restores all of them, and [[TextAnalysis.HashIdfModel.merged]]
    * refuses mismatches). df counts stay longs, so save→load→merge
    * chains are exact, not float-rounded.
    */
  def saveHashIdf(
      spark: SparkSession, model: TextAnalysis.HashIdfModel, path: String): Unit = {
    import spark.implicits._
    Seq((model.dim, model.ngrams, model.seed, model.ngramsMin,
        model.sublinearTf, model.nDocs, model.df.toSeq))
      .toDF("dim", "ngrams", "seed", "ngrams_min", "sublinear_tf", "n_docs", "df")
      .coalesce(1)
      .write
      .mode(SaveMode.Overwrite)
      .parquet(s"$path/hashidf")
  }

  def loadHashIdf(spark: SparkSession, path: String): TextAnalysis.HashIdfModel = {
    val r = spark.read.parquet(s"$path/hashidf").head()
    TextAnalysis.HashIdfModel(
      r.getInt(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getBoolean(4),
      r.getLong(5), r.getSeq[Long](6).toArray)
  }

  /** Persist a frozen [[Dsir.DsirModel]] — the importance-resampling
    * log-ratio table. All state is fixed-size (buckets doubles + three
    * scalars); doubles travel as parquet doubles, so a loaded model's
    * `logWeight` is bit-identical to the fitted one's (IndexStoreSpec
    * locks per-document weight equality).
    */
  def saveDsir(spark: SparkSession, model: Dsir.DsirModel, path: String): Unit = {
    import spark.implicits._
    Seq((model.buckets, model.seed, model.alpha, model.logRatio.toSeq))
      .toDF("buckets", "seed", "alpha", "log_ratio")
      .coalesce(1)
      .write
      .mode(SaveMode.Overwrite)
      .parquet(s"$path/dsir")
  }

  def loadDsir(spark: SparkSession, path: String): Dsir.DsirModel = {
    val r = spark.read.parquet(s"$path/dsir").head()
    Dsir.DsirModel(r.getInt(0), r.getInt(1), r.getDouble(2),
      r.getSeq[Double](3).toArray)
  }

  /** Persist a frozen [[LmQuality.BigramLm]] — the CCNet-style
    * reference language model. The three maps persist as plain rows
    * (the bigram table can reach millions of entries — row storage,
    * not a single array cell); every value is an int/long/string, so
    * the roundtrip is exact and a loaded model's `avgLogProb` equals
    * the trained one's bit-for-bit.
    */
  def saveBigramLm(
      spark: SparkSession, model: LmQuality.BigramLm, path: String): Unit = {
    import spark.implicits._
    model.vocab.toSeq.toDF("tok", "id")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/lm_vocab")
    model.contextTotals.toSeq.toDF("ctx", "total")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/lm_context")
    model.bigrams.toSeq.toDF("key", "count")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/lm_bigrams")
  }

  def loadBigramLm(spark: SparkSession, path: String): LmQuality.BigramLm =
    LmQuality.BigramLm(
      spark.read.parquet(s"$path/lm_vocab").collect()
        .map(r => r.getString(0) -> r.getInt(1)).toMap,
      spark.read.parquet(s"$path/lm_context").collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap,
      spark.read.parquet(s"$path/lm_bigrams").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap)

  /** Persist a frozen [[Bpe.BpeModel]] — the tokenizer is the MOST
    * frozen artifact in a training pipeline (every token count,
    * packing boundary, and budget decision is defined relative to
    * one tokenizer; retraining it mid-corpus silently re-segments
    * everything downstream). Merge ORDER is the model — rank i
    * applies before rank i+1 — so merges persist with their explicit
    * rank and load re-sorts by it; strings roundtrip exactly, and the
    * cached-encoder fingerprint of a loaded model equals the
    * original's (IndexStoreSpec locks identical tokenization).
    */
  def saveBpe(
      spark: SparkSession, model: Bpe.BpeModel, path: String): Unit = {
    import spark.implicits._
    model.merges.zipWithIndex.toSeq
      .map { case ((a, b), i) => (i, a, b) }
      .toDF("rank", "left", "right")
      .coalesce(1)
      .write
      .mode(SaveMode.Overwrite)
      .parquet(s"$path/bpe_merges")
  }

  def loadBpe(spark: SparkSession, path: String): Bpe.BpeModel =
    Bpe.BpeModel(
      spark.read
        .parquet(s"$path/bpe_merges")
        .orderBy("rank")
        .collect()
        .map(r => (r.getString(1), r.getString(2))))

  /** Persist a frozen [[Dedup.ShinglePoolModel]] — the benchmark
    * decontamination pool, fit once and served to every batch job and
    * streaming microbatch. The window width `n` travels with the
    * hashes (a pool applied at a different width would match a
    * different space); hashes are 64-bit longs, so save→load→apply and
    * save→load→[[Dedup.ShinglePoolModel.merged]] chains are exact.
    * Unlike the KB-sized codebooks above, a pool can reach
    * [[Dedup.MaxExactPoolShingles]] longs (80 MB), so it is written as
    * ROWS (one `g` per distinct hash, plus a 1-row meta) rather than a
    * single array cell, and loaded with a sort on the driver — same
    * sorted-array invariant as the fit path.
    */
  def saveShinglePool(
      spark: SparkSession, pool: Dedup.ShinglePoolModel, path: String): Unit = {
    import spark.implicits._
    Seq((pool.n, pool.hashes.length.toLong))
      .toDF("n", "n_hashes")
      .coalesce(1)
      .write
      .mode(SaveMode.Overwrite)
      .parquet(s"$path/shingle_pool_meta")
    pool.hashes.toSeq
      .toDF("g")
      .coalesce(1)
      .write
      .mode(SaveMode.Overwrite)
      .parquet(s"$path/shingle_pool")
  }

  def loadShinglePool(spark: SparkSession, path: String): Dedup.ShinglePoolModel = {
    val meta = spark.read.parquet(s"$path/shingle_pool_meta").head()
    val hashes = spark.read
      .parquet(s"$path/shingle_pool")
      .collect()
      .map(_.getLong(0))
    // defense against a partially-written or foreign directory: the
    // meta count must match the materialized rows
    require(hashes.length.toLong == meta.getLong(1),
      s"loadShinglePool: $path holds ${hashes.length} hashes but meta says " +
        s"${meta.getLong(1)} — incomplete or foreign pool directory")
    java.util.Arrays.sort(hashes)
    Dedup.ShinglePoolModel(meta.getInt(0), hashes)
  }
}
