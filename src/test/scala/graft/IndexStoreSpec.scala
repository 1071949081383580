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
}
