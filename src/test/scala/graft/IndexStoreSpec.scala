package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Clustering, IndexStore, Similarity}

class IndexStoreSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-index-store").toString

  private lazy val emb = {
    val rng = new scala.util.Random(63)
    (0 until 6).flatMap { c =>
      (0 until 20).map { m =>
        val v = Array.fill(16)(0.1f * rng.nextGaussian().toFloat)
        v(c * 2) += 1f
        ((c * 100 + m).toLong, v.toSeq)
      }
    }.toDF("vec_id", "embedding")
  }

  test("IVF roundtrip: centroids bit-exact, search results identical") {
    val model = Similarity.trainIvf(emb, "embedding", nlist = 6)
    val dir = tmp()
    IndexStore.saveIvf(spark, model, dir)
    val loaded = IndexStore.loadIvf(spark, dir)
    assert(loaded.centroids.length == model.centroids.length)
    model.centroids.zip(loaded.centroids).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b))
    }
    val q = emb.where($"vec_id" % 100 === 0)
    val orig = Similarity.ivfTopK(emb, q, "vec_id", "embedding", k = 3, model)
      .orderBy("query_id", "rank").collect().map(_.toSeq)
    val redo = Similarity.ivfTopK(emb, q, "vec_id", "embedding", k = 3, loaded)
      .orderBy("query_id", "rank").collect().map(_.toSeq)
    assert(orig.sameElements(redo))
  }

  test("PQ and OPQ roundtrip: codebooks and rotation bit-exact, ADC search identical") {
    val pq = Similarity.trainPq(emb, "embedding", m = 4, ksub = 8)
    val pqDir = tmp()
    IndexStore.savePq(spark, pq, pqDir)
    val pqLoaded = IndexStore.loadPq(spark, pqDir)
    assert(pqLoaded.m == pq.m && pqLoaded.ksub == pq.ksub && pqLoaded.dsub == pq.dsub)
    assert(java.util.Arrays.equals(pqLoaded.codebooks, pq.codebooks))
    val q = emb.where($"vec_id" % 100 === 0)
    val orig = Similarity.pqTopK(emb, q, "vec_id", "embedding", k = 3, pq, refine = 4)
      .orderBy("query_id", "rank").collect().map(_.toSeq)
    val redo = Similarity.pqTopK(emb, q, "vec_id", "embedding", k = 3, pqLoaded, refine = 4)
      .orderBy("query_id", "rank").collect().map(_.toSeq)
    assert(orig.sameElements(redo))

    val opq = Similarity.trainOpq(emb, "embedding", m = 4, ksub = 8, opqIterations = 2)
    val opqDir = tmp()
    IndexStore.saveOpq(spark, opq, opqDir)
    val opqLoaded = IndexStore.loadOpq(spark, opqDir)
    assert(opqLoaded.dim == opq.dim)
    assert(java.util.Arrays.equals(opqLoaded.r, opq.r))
    assert(java.util.Arrays.equals(opqLoaded.pq.codebooks, opq.pq.codebooks))
  }

  test("k-means roundtrip: assignments identical after reload") {
    val model = Clustering.trainKmeans(emb, "embedding", k = 6, iterations = 3)
    val dir = tmp()
    IndexStore.saveKmeans(spark, model, dir)
    val loaded = IndexStore.loadKmeans(spark, dir)
    val a = Clustering.assignClusters(emb, "embedding", model)
      .select("vec_id", "cluster").collect().map(r => (r.getLong(0), r.getInt(1)))
    val b = Clustering.assignClusters(emb, "embedding", loaded)
      .select("vec_id", "cluster").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(a.sameElements(b))
  }

  test("DSIR roundtrip: log-ratio doubles bit-exact, per-document weights identical") {
    import graft.operators.Dsir
    val target = Seq.fill(30)("aurora quasar pulsar nebula photon common filler words")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val raw = Seq.fill(30)("granite basalt schist gneiss marble common filler words")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val model = Dsir.fit(target, raw, "text")
    val dir = tmp()
    IndexStore.saveDsir(spark, model, dir)
    val loaded = IndexStore.loadDsir(spark, dir)
    assert(loaded.buckets == model.buckets && loaded.seed == model.seed
      && loaded.alpha == model.alpha)
    assert(java.util.Arrays.equals(loaded.logRatio, model.logRatio),
      "log-ratio table must roundtrip bit-exact")
    val probes = Seq("aurora photon text", "granite marble text", "", "unseen words only")
    probes.foreach { t =>
      assert(java.lang.Double.compare(loaded.logWeight(t), model.logWeight(t)) == 0,
        s"logWeight must be bit-identical for '$t'")
    }
  }

  test("bigram LM roundtrip: maps exact, avgLogProb bit-identical") {
    import graft.operators.LmQuality
    val ref = Seq.fill(20)("the quick brown fox jumps over the lazy dog")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val model = LmQuality.train(ref, "text", vocabSize = 50)
    val dir = tmp()
    IndexStore.saveBigramLm(spark, model, dir)
    val loaded = IndexStore.loadBigramLm(spark, dir)
    assert(loaded.vocab == model.vocab)
    assert(loaded.contextTotals == model.contextTotals)
    assert(loaded.bigrams == model.bigrams)
    val probes = Seq("the quick brown fox", "fox brown quick the", "one", null)
    probes.foreach { t =>
      val (a, b) = (model.avgLogProb(t), loaded.avgLogProb(t))
      assert(a.isDefined == b.isDefined &&
        a.zip(b).forall { case (x, y) => java.lang.Double.compare(x, y) == 0 },
        s"avgLogProb must be bit-identical for '$t'")
    }
  }

  test("BPE roundtrip: merge order exact, loaded model tokenizes identically") {
    import graft.operators.Bpe
    val docs = Seq.fill(40)("the theme then there of that the other theory")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val model = Bpe.train(docs, "text", numMerges = 12)
    assert(model.merges.nonEmpty, "fixture must learn at least one merge")
    val dir = tmp()
    IndexStore.saveBpe(spark, model, dir)
    val loaded = IndexStore.loadBpe(spark, dir)
    // merge ORDER is the model: rank-for-rank equality, not set equality
    assert(loaded.merges.toSeq == model.merges.toSeq,
      "merge rules must roundtrip in rank order")
    val probe = Seq((1L, "the theory thereof"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val a = Bpe.withBpeTokens(probe, "text", model)
      .orderBy("doc_id").select("bpe_tokens").collect().map(_.getSeq[String](0)).toSeq
    val b = Bpe.withBpeTokens(probe, "text", loaded)
      .orderBy("doc_id").select("bpe_tokens").collect().map(_.getSeq[String](0)).toSeq
    assert(a == b, "loaded model must tokenize identically")
  }

  test("shingle pool roundtrip: n and hashes bit-exact, excision identical; corrupt meta is a named error") {
    import graft.operators.Dedup
    val bench = Seq(
      Tuple1("alpha beta gamma delta epsilon"),
      Tuple1("zeta eta theta iota kappa"),
    ).toDF("text")
    val corpus = Seq(
      (1L, "pre text alpha beta gamma delta epsilon post text here"),
      (2L, "nothing quoted in this clean document at all today"),
    ).toDF("doc_id", "text")
    val pool = Dedup.fitShinglePool(bench, "text", n = 5)
    val dir = tmp()
    IndexStore.saveShinglePool(spark, pool, dir)
    val loaded = IndexStore.loadShinglePool(spark, dir)
    assert(loaded.n == pool.n)
    assert(java.util.Arrays.equals(loaded.hashes, pool.hashes),
      "hashes must roundtrip bit-exact (longs, sorted)")
    val a = Dedup.decontaminateSpansWithPool(corpus, pool, "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = Dedup.decontaminateSpansWithPool(corpus, loaded, "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b, "loaded pool must excise identically")
    // a meta/hashes count mismatch (partial write, foreign dir) is a
    // named error, not a silently-smaller pool
    val dir2 = tmp()
    IndexStore.saveShinglePool(spark, pool, dir2)
    IndexStore.saveShinglePool(spark,
      Dedup.ShinglePoolModel(pool.n, pool.hashes.take(1)), dir2)
    // overwrite hashes only, keep the 2-hash meta → mismatch
    spark.createDataFrame(Seq(Tuple1(pool.hashes.head))).toDF("g")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir2/shingle_pool")
    spark.createDataFrame(Seq((pool.n, 2L))).toDF("n", "n_hashes")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir2/shingle_pool_meta")
    val e = intercept[IllegalArgumentException] {
      IndexStore.loadShinglePool(spark, dir2)
    }
    assert(e.getMessage.contains("incomplete or foreign pool directory"), e.getMessage)
  }
}
