package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  test("cosineCol matches hand-computed cosine") {
    val df = Seq((Seq(1f, 0f, 0f), Seq(0.6f, 0.8f, 0f))).toDF("a", "b")
    val c = df.select(Similarity.cosineCol($"a", $"b")).as[Double].head()
    assert(math.abs(c - 0.6) < 1e-6) // inputs are float32 → ~1e-8 representation error
  }

  test("bruteForceTopK: exact neighbors, rank order, no self-match") {
    // vectors on a line: cosine with query (1,0) decreasing with angle
    val vecs = (0L to 9L).map { i =>
      val theta = i * 0.1
      (i, Seq(math.cos(theta).toFloat, math.sin(theta).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity
      .bruteForceTopK(df, df.where($"vec_id" === 0L), "vec_id", "embedding", k = 3)
      .orderBy("rank")
      .collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L))
    assert(out.forall(_.getAs[Long]("neighbor_id") != 0L))
    val cosines = out.map(_.getAs[Double]("cosine"))
    assert(cosines.sameElements(cosines.sorted.reverse))
  }

  test("ivf ANN: high recall on clustered data with full probing") {
    val rng = new scala.util.Random(11)
    val vecs = (0 until 8).flatMap { c =>
      val center = Array.fill(8)(rng.nextGaussian().toFloat)
      (0 until 25).map(m => (c * 25L + m, center.map(x => x + 0.1f * rng.nextGaussian().toFloat).toSeq))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.where($"vec_id" % 25 === 0)
    val model = Similarity.trainIvf(df, "embedding", nlist = 8, seed = 3L)
    val exact = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approxFull = Similarity.ivfTopK(df, queries, "vec_id", "embedding", k = 5, model, nprobe = 8)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // nprobe = nlist probes everything → must equal brute force exactly
    assert(approxFull == exact, "full-probe IVF must match brute force")
    val approx2 = Similarity.ivfTopK(df, queries, "vec_id", "embedding", k = 5, model, nprobe = 2)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = approx2.intersect(exact).size.toDouble / exact.size
    assert(recall > 0.8, s"clustered-data recall@5 with nprobe=2: $recall")
    // the huge-query-set path (shuffle join by cell, no broadcast) is
    // the SAME computation — results must be identical, per (q, n) pair
    val partitioned = Similarity
      .ivfTopK(df, queries, "vec_id", "embedding", k = 5, model, nprobe = 2,
        broadcastQueries = false)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(partitioned == approx2, "partitioned-query IVF must equal the broadcast path")
  }

  test("topk aggregator: deterministic tie-break by id") {
    val df = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(1f, 0f)), (3L, Seq(1f, 0f)), (9L, Seq(1f, 0f)),
    ).toDF("vec_id", "embedding")
    val q = Seq((100L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(df, q, "vec_id", "embedding", k = 2)
      .orderBy("rank").collect().map(_.getAs[Long]("neighbor_id")).toSeq
    assert(out == Seq(1L, 2L), s"ties must resolve by ascending id: $out")
  }
}
