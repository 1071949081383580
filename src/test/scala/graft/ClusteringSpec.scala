package graft

import org.apache.spark.sql.functions._

import graft.operators.Clustering

class ClusteringSpec extends SparkTestBase {
  import spark.implicits._

  /** Three well-separated direction bundles in 8-d: axis-aligned
    * centers with small Gaussian noise — the easy regime where
    * spherical k-means with k=3 must put every member of a bundle in
    * one cluster and distinct bundles in distinct clusters.
    */
  private def bundles(perGroup: Int) = {
    val rng = new scala.util.Random(7)
    (0 until 3).flatMap { g =>
      (0 until perGroup).map { m =>
        val v = Array.fill(8)(0.05f * rng.nextGaussian().toFloat)
        v(g * 3) += 1f
        (g * 1000L + m, v.toSeq)
      }
    }
  }

  test("trainKmeans recovers planted direction bundles") {
    val df = bundles(40).toDF("vec_id", "embedding")
    val model = Clustering.trainKmeans(df, "embedding", k = 3, iterations = 6)
    val assigned = Clustering
      .assignClusters(df, "embedding", model)
      .select($"vec_id", $"cluster")
      .as[(Long, Int)]
      .collect()
      .toMap
    val groups = assigned.groupBy { case (id, _) => id / 1000 }.map { case (g, m) =>
      g -> m.values.toSet
    }
    // every bundle lands entirely in one cluster; bundles don't share
    groups.values.foreach(cs => assert(cs.size == 1, s"bundle split across $cs"))
    assert(groups.values.flatten.toSet.size == 3)
  }

  test("trainKmeans is deterministic") {
    val df = bundles(20).toDF("vec_id", "embedding")
    val a = Clustering.trainKmeans(df, "embedding", k = 4, iterations = 4)
    val b = Clustering.trainKmeans(df, "embedding", k = 4, iterations = 4)
    assert(a.centroids.map(_.toSeq).toSeq == b.centroids.map(_.toSeq).toSeq)
  }

  test("full-corpus refinement does not degrade the sampled-init objective") {
    val df = bundles(40).toDF("vec_id", "embedding")
    def objective(model: Clustering.KmeansModel): Double =
      Clustering
        .clusterProfile(df, "embedding", model)
        .agg(sum($"mean_cosine" * $"n") / sum($"n"))
        .as[Double]
        .head()
    val init = Clustering.trainKmeans(df, "embedding", k = 3, iterations = 0)
    val refined = Clustering.trainKmeans(df, "embedding", k = 3, iterations = 6)
    assert(objective(refined) >= objective(init) - 1e-9)
  }

  test("clusterProfile sizes sum to the corpus and cohesion is high on bundles") {
    val df = bundles(30).toDF("vec_id", "embedding")
    val model = Clustering.trainKmeans(df, "embedding", k = 3, iterations = 6)
    val prof = Clustering.clusterProfile(df, "embedding", model).collect()
    assert(prof.map(_.getAs[Long]("n")).sum == 90L)
    prof.foreach(r => assert(r.getAs[Double]("mean_cosine") > 0.9))
  }

  test("degenerate inputs: empty corpus and k larger than n") {
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val m0 = Clustering.trainKmeans(empty, "embedding", k = 8)
    assert(m0.k == 0) // explicit empty-corpus marker, no crash
    val tiny = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f))).toDF("vec_id", "embedding")
    val m2 = Clustering.trainKmeans(tiny, "embedding", k = 16, iterations = 3)
    assert(m2.k <= 2)
    val assigned = Clustering.assignClusters(tiny, "embedding", m2)
    assert(assigned.count() == 2)
  }

  test("trainKmeans skips null and zero-length embedding rows") {
    val df = Seq(
      (1L, Seq(1f, 0f)),
      (2L, null: Seq[Float]),
      (3L, Seq.empty[Float]),
      (4L, Seq(0f, 1f)),
    ).toDF("vec_id", "embedding")
    val m = Clustering.trainKmeans(df, "embedding", k = 2, iterations = 3)
    assert(m.k >= 1 && m.k <= 2)
    // assignment still lands null/empty rows in cluster 0, not a crash
    assert(Clustering.assignClusters(df, "embedding", m).count() == 4L)
  }

  test("kSweep: simplified silhouette peaks at the planted cluster count") {
    val df = bundles(40).toDF("vec_id", "embedding")
    val sweep = Clustering
      .kSweep(df, "embedding", Seq(2, 3, 4, 5), iterations = 4)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
    assert(sweep.map(_._1).toSeq == Seq(2, 3, 4, 5))
    assert(sweep.forall(_._2 == 120L)) // every sweep point sees all rows
    val best = sweep.filter(_._5)
    assert(best.length == 1 && best.head._1 == 3, s"best = ${best.toSeq}")
    // inertia is non-increasing in k on nested-refinement data
    val byK = sweep.map(t => t._1 -> t._3).toMap
    assert(byK(3) < byK(2), s"inertia should drop at the true k: $byK")
  }

  test("kSweep: k < 2 is a named error; empty corpus yields empty result") {
    val df = bundles(5).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Clustering.kSweep(df, "embedding", Seq(1, 2))
    }
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Clustering.kSweep(empty, "embedding", Seq(2, 3)).count() == 0L)
  }

  test("kCenterGreedy: recovers planted orthogonal outliers exactly") {
    // 60 bulk points near e0; 4 plants on their own axes
    val rnd = new scala.util.Random(11)
    val bulk = (10L to 69L).map { id =>
      val v = Array.fill(8)(0.01f * rnd.nextFloat())
      v(0) = 1f
      (id, v.toSeq)
    }
    val plants = Seq(101L, 102L, 103L, 104L).zipWithIndex.map { case (id, i) =>
      val v = new Array[Float](8)
      v(i + 1) = 1f
      (id, v.toSeq)
    }
    val df = rnd.shuffle(bulk ++ plants).toDF("id", "vec").repartition(6)
    val out = Clustering
      .kCenterGreedy(df, "id", "vec", k = 5)
      .collect()
    // seed = min id (bulk 10), then the 4 plants in some order
    assert(out.map(_.getAs[Long]("id")).toSet == Set(10L, 101L, 102L, 103L, 104L))
    // dist_at_pick is the running coverage radius: non-increasing after round 1
    val dists = out.sortBy(_.getAs[Int]("pick_order")).map(_.getAs[Double]("dist_at_pick"))
    assert(dists.tail.zip(dists.tail.drop(1)).forall { case (a, b) => b <= a + 1e-9 })
  }

  test("kCenterGreedy: deterministic under repartitioning; early-stop on exact cover") {
    val pts = (1L to 40L).map(id => (id, Seq((id % 7).toFloat + 1f, ((id * 3) % 5).toFloat)))
    val a = Clustering.kCenterGreedy(pts.toDF("id", "vec").repartition(3), "id", "vec", 6)
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._2).toSeq
    val b = Clustering.kCenterGreedy(pts.toDF("id", "vec").repartition(11), "id", "vec", 6)
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._2).toSeq
    assert(a == b, s"layout changed the selection: $a vs $b")
    // only 2 distinct directions → k=5 stops after 2 picks
    val dup = Seq((1L, Seq(1f, 0f)), (2L, Seq(1f, 0f)), (3L, Seq(0f, 1f)), (4L, Seq(0f, 1f)))
    val out = Clustering.kCenterGreedy(dup.toDF("id", "vec"), "id", "vec", 5).collect()
    assert(out.length == 2 && out.map(_.getLong(0)).toSet == Set(1L, 3L))
  }

  test("kCenterGreedy: a ragged vector is a named error, not silent truncation") {
    val df = Seq((1L, Seq(1f, 0f, 0f)), (2L, Seq(0f, 1f))).toDF("id", "vec")
    val e = intercept[Exception](Clustering.kCenterGreedy(df, "id", "vec", 2).collect())
    assert(e.getMessage != null)
  }

  test("kCenterOversampled: matches exact greedy on planted geometry, fewer scans") {
    val rnd = new scala.util.Random(23)
    val bulk = (10L to 209L).map { id =>
      val v = Array.fill(8)(0.01f * rnd.nextFloat())
      v(0) = 1f
      (id, v.toSeq)
    }
    val plants = Seq(501L, 502L, 503L, 504L, 505L).zipWithIndex.map { case (id, i) =>
      val v = new Array[Float](8)
      v(i + 1) = 1f
      (id, v.toSeq)
    }
    val df = rnd.shuffle(bulk ++ plants).toDF("id", "vec").repartition(7)
    val exact = Clustering.kCenterGreedy(df, "id", "vec", 6)
      .collect().map(_.getAs[Long]("id")).toSet
    val approx = Clustering.kCenterOversampled(df, "id", "vec", 6, oversample = 8, rounds = 4)
      .collect().map(_.getAs[Long]("id")).toSet
    // plants dominate the dist² mass, so the candidate sweep catches
    // them all and the driver-side greedy reproduces the exact set
    assert(approx == exact, s"approx=$approx exact=$exact")
    // determinism under layout change
    val again = Clustering
      .kCenterOversampled(df.repartition(3), "id", "vec", 6, oversample = 8, rounds = 4)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(again == approx)
  }
}
