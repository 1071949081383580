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

  test("mmrTopK: redundancy penalized — the near-copy loses rank 2 to the diverse doc") {
    // A1/A2 nearly identical directions near the query; B distinct but
    // relevant; plain relevance ranks (A1, A2, B), MMR at λ=0.5 must
    // rank (A1, B) — the redundancy penalty is the operator's point
    val corpus = Seq(
      (1L, Seq(0.95f, 0.31f, 0f)), // A1: most relevant
      (2L, Seq(0.949f, 0.315f, 0f)), // A2: near-copy of A1
      (3L, Seq(0.5f, 0f, 0.866f)), // B: diverse, still relevant
    ).toDF("vec_id", "embedding")
    val query = Seq((100L, Seq(1f, 0f, 0f))).toDF("vec_id", "embedding")
    val mmr = graft.operators.Similarity
      .mmrTopK(corpus, query, "vec_id", "embedding", k = 2, poolSize = 3, lambda = 0.5)
      .select("mmr_rank", "neighbor_id")
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(mmr == Map(1L -> 1L, 2L -> 3L), s"mmr picks: $mmr")
    // λ = 1 degenerates to plain relevance order (bruteForceTopK)
    val plain = graft.operators.Similarity
      .mmrTopK(corpus, query, "vec_id", "embedding", k = 3, poolSize = 3, lambda = 1.0)
      .select("mmr_rank", "neighbor_id")
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(plain == Map(1L -> 1L, 2L -> 2L, 3L -> 3L), s"λ=1 order: $plain")
    // rank 1 relevance rides through; guards fire on bad params
    intercept[IllegalArgumentException] {
      graft.operators.Similarity.mmrTopK(corpus, query, "vec_id", "embedding",
        k = 5, poolSize = 3)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Similarity.mmrTopK(corpus, query, "vec_id", "embedding",
        k = 2, lambda = 1.5)
    }
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

  test("hammingTopK: full-shortlist equals brute force; tight refine recovers sign-separable neighbors") {
    val rng = new scala.util.Random(91)
    val vecs = (0L until 60L).map(i => (i, Seq.fill(32)(rng.nextGaussian().toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.where($"vec_id" < 5L)
    // refine·k ≥ corpus → the shortlist is the whole corpus and the
    // exact re-rank must reproduce brute force bit-for-bit
    val exhaustive = Similarity
      .hammingTopK(df, queries, "vec_id", "embedding", k = 3, refine = 20)
      .orderBy("query_id", "rank")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val brute = Similarity
      .bruteForceTopK(df, queries, "vec_id", "embedding", k = 3)
      .orderBy("query_id", "rank")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(exhaustive.sameElements(brute))
    // tight refine: a near-copy differs by <1 sign bit, so the Hamming
    // shortlist must retain it and the re-rank must rank it first
    val copies = df
      .where($"vec_id" < 5L)
      .select(($"vec_id" + 1000L).as("vec_id"),
        transform($"embedding", (x, i) => when(i === 0, x + lit(0.01f)).otherwise(x))
          .as("embedding"))
    val planted = Similarity
      .hammingTopK(df.unionByName(copies), copies, "vec_id", "embedding", k = 1, refine = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    (0L until 5L).foreach(i => assert(planted(i + 1000L) == i, s"query ${i + 1000L}"))
  }

  test("ivfHammingTopK: full probe + full shortlist equals brute force; pruned keeps planted recall") {
    val rng = new scala.util.Random(17)
    val vecs = (0 until 8).flatMap { c =>
      (0 until 12).map { m =>
        val v = Array.fill(32)(0.15f * rng.nextGaussian().toFloat)
        v(c * 4) += 1f
        ((c * 100 + m).toLong, v.toSeq)
      }
    }
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.where($"vec_id" % 100 === 0)
    val model = Similarity.trainIvf(df, "embedding", nlist = 8)
    // nprobe = nlist and refine·k ≥ corpus → must equal brute force
    val full = Similarity
      .ivfHammingTopK(df, queries, "vec_id", "embedding", k = 3, model, nprobe = 8, refine = 32)
      .orderBy("query_id", "rank")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val brute = Similarity
      .bruteForceTopK(df, queries, "vec_id", "embedding", k = 3)
      .orderBy("query_id", "rank")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(full.sameElements(brute))
    // pruned probing: cluster members live in the probed cells, so
    // each query's top-1 must come from its own cluster
    val pruned = Similarity
      .ivfHammingTopK(df, queries, "vec_id", "embedding", k = 1, model, nprobe = 2, refine = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    pruned.foreach { case (q, n) => assert(n / 100 == q / 100, s"query $q got $n") }
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

  test("semanticDedup: planted ε-balls collapse to one keeper, singletons survive") {
    val rng = new scala.util.Random(5)
    def unit(dim: Int): Array[Float] = {
      val v = Array.fill(dim)(rng.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    // 40 well-separated singletons + 10 groups of 3 near-identical copies
    val singles = (0 until 40).map(i => (i.toLong, unit(16).toSeq))
    val groups = (0 until 10).flatMap { g =>
      val base = unit(16)
      (0 until 3).map { m =>
        val noisy = base.map(x => x + 0.001f * rng.nextGaussian().toFloat)
        (100L + g * 10 + m, noisy.toSeq)
      }
    }
    val df = (singles ++ groups).toDF("vec_id", "embedding").repartition(5)
    val out = Similarity
      .semanticDedup(df, "vec_id", "embedding", nlist = 6, eps = 0.99, seed = 9L)
    val rows = out
      .select("id", "component", "is_kept")
      .as[(Long, Long, Boolean)]
      .collect()
    val kept = rows.filter(_._3).map(_._1).toSet
    // every planted trio keeps exactly one member; all singletons survive
    (0 until 10).foreach { g =>
      val ids = Set(100L + g * 10, 101L + g * 10, 102L + g * 10)
      assert(kept.intersect(ids).size == 1, s"group $g kept ${kept.intersect(ids)}")
      val comps = rows.filter(r => ids.contains(r._1)).map(_._2).toSet
      assert(comps.size == 1, s"group $g not one component: $comps")
    }
    assert((0L until 40L).forall(kept.contains), "singletons must all be kept")
    // keeper = lowest centroid similarity in its component (the paper's rule)
    val centSims = out.select("id", "component", "cent_sim", "is_kept")
      .as[(Long, Long, Double, Boolean)].collect()
    centSims.groupBy(_._2).values.filter(_.length > 1).foreach { grp =>
      val keeper = grp.filter(_._4)
      assert(keeper.length == 1)
      val minSim = grp.map(_._3).min
      assert(keeper.head._3 == minSim, s"keeper must have min cent_sim in ${grp.toSeq}")
    }
    out.unpersist()
  }

  test("semanticDedup auto-nlist: cell count tracks corpus size, dedup still exact on planted trios") {
    val rng = new scala.util.Random(11)
    def unit(dim: Int): Array[Float] = {
      val v = Array.fill(dim)(rng.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val singles = (0 until 60).map(i => (i.toLong, unit(16).toSeq))
    val trio = {
      val base = unit(16)
      (0 until 3).map(m => (200L + m, base.map(x => x + 0.001f * rng.nextGaussian().toFloat).toSeq))
    }
    val df = (singles ++ trio).toDF("vec_id", "embedding").repartition(4)
    // 63 rows / targetClusterRows=8 → ~8 auto cells (floor 16 applies ⇒ 16);
    // the planted trio must still collapse to one keeper
    val out = Similarity.semanticDedup(df, "vec_id", "embedding", eps = 0.99, seed = 3L,
      targetClusterRows = 8)
    val kept = out.select("id", "is_kept").as[(Long, Boolean)].collect()
      .filter(_._2).map(_._1).toSet
    assert(kept.intersect(Set(200L, 201L, 202L)).size == 1, s"trio kept ${kept.intersect(Set(200L, 201L, 202L))}")
    assert((0L until 60L).forall(kept.contains), "singletons must all be kept")
    // cells in the output span more than a fixed tiny layout — the
    // corpus-derived count is in effect (floor 16 > the 6-cell layout
    // the explicit-nlist planted test uses)
    val nCells = out.select("cell").distinct().count()
    assert(nCells > 6 && nCells <= 16, s"auto nlist should land in (6, 16], got $nCells")
  }

  test("pq ANN: exhaustive refine equals brute force; tight refine keeps recall") {
    val rng = new scala.util.Random(13)
    val vecs = (0 until 8).flatMap { c =>
      val center = Array.fill(8)(rng.nextGaussian().toFloat)
      (0 until 25).map(m =>
        (c * 25L + m, center.map(x => x + 0.1f * rng.nextGaussian().toFloat).toSeq))
    }
    val df = vecs.toDF("vec_id", "embedding").repartition(5)
    val queries = df.where($"vec_id" % 25 === 0)
    val model = Similarity.trainPq(df, "embedding", m = 4, ksub = 16, seed = 3L)
    val exact = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // refine·k ≥ corpus → every row is re-ranked exactly → identical output
    val full = Similarity.pqTopK(df, queries, "vec_id", "embedding", k = 5, model, refine = 40)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(full == exact, "exhaustive-refine PQ must equal brute force")
    val tight = Similarity.pqTopK(df, queries, "vec_id", "embedding", k = 5, model, refine = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactPairs = exact.map(t => (t._1, t._2))
    val recall = tight.intersect(exactPairs).size.toDouble / exactPairs.size
    assert(recall > 0.8, s"clustered-data recall@5 with refine=4: $recall")
  }

  test("opq: learned rotation is orthonormal and training is deterministic") {
    val rng = new scala.util.Random(17)
    val df = (0 until 120)
      .map(i => (i.toLong, Array.fill(8)(rng.nextGaussian().toFloat).toSeq))
      .toDF("vec_id", "embedding")
    val a = Similarity.trainOpq(df, "embedding", m = 4, ksub = 8, opqIterations = 3)
    val b = Similarity.trainOpq(df, "embedding", m = 4, ksub = 8, opqIterations = 3)
    assert(a.r.toSeq == b.r.toSeq && a.pq.codebooks.toSeq == b.pq.codebooks.toSeq)
    val d = a.dim
    // RᵀR ≈ I
    for (i <- 0 until d; j <- 0 until d) {
      var acc = 0.0
      for (t <- 0 until d) acc += a.r(t * d + i).toDouble * a.r(t * d + j)
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(acc - expect) < 1e-4, s"RtR[$i,$j]=$acc")
    }
  }

  test("opq: quantization error ≤ plain PQ on cross-subspace-correlated data") {
    // energy deliberately straddles the m=2 subspace boundary: dims
    // (i, i+4) are near-duplicates, so PQ's independent-half codebooks
    // waste bits encoding the same coordinate twice; the OPQ rotation
    // can decorrelate the halves
    val rng = new scala.util.Random(23)
    val df = (0 until 400).map { i =>
      val base = Array.fill(4)(rng.nextGaussian().toFloat)
      val v = new Array[Float](8)
      for (t <- 0 until 4) {
        v(t) = base(t)
        v(t + 4) = base(t) + 0.05f * rng.nextGaussian().toFloat
      }
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val pq = Similarity.trainPq(df, "embedding", m = 2, ksub = 16)
    val opq = Similarity.trainOpq(df, "embedding", m = 2, ksub = 16, opqIterations = 5)
    val pqErr = Similarity.quantizationError(df, "embedding", pq)
    val opqErr = Similarity.quantizationError(df, "embedding", opq.pq, rotation = Some(opq))
    assert(opqErr <= pqErr * 1.001, s"opq $opqErr vs pq $pqErr")
  }

  test("opq ANN: exhaustive refine equals brute force; tight refine keeps recall") {
    val rng = new scala.util.Random(13)
    val vecs = (0 until 8).flatMap { c =>
      val center = Array.fill(8)(rng.nextGaussian().toFloat)
      (0 until 25).map(m =>
        (c * 25L + m, center.map(x => x + 0.1f * rng.nextGaussian().toFloat).toSeq))
    }
    val df = vecs.toDF("vec_id", "embedding").repartition(5)
    val queries = df.where($"vec_id" % 25 === 0)
    val model = Similarity.trainOpq(df, "embedding", m = 4, ksub = 16, opqIterations = 3)
    val exact = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // rotation preserves cosines, so exhaustive re-rank ≡ brute force
    val full = Similarity.opqTopK(df, queries, "vec_id", "embedding", k = 5, model, refine = 40)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(full == exact, "exhaustive-refine OPQ must equal brute force")
    val tight = Similarity.opqTopK(df, queries, "vec_id", "embedding", k = 5, model, refine = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactPairs = exact.map(t => (t._1, t._2))
    val recall = tight.intersect(exactPairs).size.toDouble / exactPairs.size
    assert(recall > 0.8, s"clustered-data recall@5 with refine=4: $recall")
  }

  test("pq ADC expression: codegen score equals hand-computed LUT sum") {
    val code = Array[Byte](0, 3, 255.toByte)
    val ksub = 256
    val lut = Array.tabulate(3 * ksub)(i => i * 0.5f)
    val df = Seq((code, lut.toSeq)).toDF("code", "lut")
    val got = df
      .select(graft.functions.VectorExpressions.pqAdcScore($"code", $"lut", ksub).as("s"))
      .as[Double]
      .head()
    val want = lut(0).toDouble + lut(ksub + 3).toDouble + lut(2 * ksub + 255).toDouble
    assert(got == want, s"got $got want $want (byte 255 must read as unsigned)")
  }

  test("ivf-pq ANN: full probe + exhaustive refine equals brute force; pruned keeps recall") {
    val rng = new scala.util.Random(29)
    val vecs = (0 until 8).flatMap { c =>
      val center = Array.fill(8)(rng.nextGaussian().toFloat)
      (0 until 25).map(m =>
        (c * 25L + m, center.map(x => x + 0.1f * rng.nextGaussian().toFloat).toSeq))
    }
    val df = vecs.toDF("vec_id", "embedding").repartition(5)
    val queries = df.where($"vec_id" % 25 === 0)
    val ivf = Similarity.trainIvf(df, "embedding", nlist = 8, seed = 3L)
    val pq = Similarity.trainPq(df, "embedding", m = 4, ksub = 16, seed = 3L)
    val exact = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = Similarity
      .ivfPqTopK(df, queries, "vec_id", "embedding", k = 5, ivf, pq, nprobe = 8, refine = 40)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(full == exact, "full-probe exhaustive-refine IVF-PQ must equal brute force")
    val pruned = Similarity
      .ivfPqTopK(df, queries, "vec_id", "embedding", k = 5, ivf, pq, nprobe = 2, refine = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactPairs = exact.map(t => (t._1, t._2))
    val recall = pruned.intersect(exactPairs).size.toDouble / exactPairs.size
    assert(recall > 0.7, s"clustered-data recall@5 nprobe=2 refine=4: $recall")
    // partitioned-query path must equal the broadcast path
    val parted = Similarity
      .ivfPqTopK(df, queries, "vec_id", "embedding", k = 5, ivf, pq, nprobe = 2, refine = 4,
        broadcastQueries = false)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(parted == pruned)
  }

  test("recallAtK: measures intersection fractions exactly; the tuning loop reads 1.0 at full coverage") {
    val rng = new scala.util.Random(43)
    val vecs = (0 until 8).flatMap { c =>
      val center = Array.fill(8)(rng.nextGaussian().toFloat)
      (0 until 25).map(m =>
        (c * 25L + m, center.map(x => x + 0.1f * rng.nextGaussian().toFloat).toSeq))
    }
    val df = vecs.toDF("vec_id", "embedding").repartition(5)
    val queries = df.where($"vec_id" % 25 === 0)
    val exact = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", k = 4)
      .localCheckpoint(true)
    def recalls(out: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Double)] =
      out.orderBy("query_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // truth vs itself: 1.0 everywhere
    assert(recalls(Similarity.recallAtK(exact, exact, 4))
      .forall { case (_, ne, nm, r) => ne == 4L && nm == 4L && r == 1.0 })
    // half-corrupted: exactly 0.5 everywhere (the q186 plant)
    val corrupted = exact.withColumn("neighbor_id",
      when($"rank" % 2 === 0, $"neighbor_id" + 1000000000L).otherwise($"neighbor_id"))
    assert(recalls(Similarity.recallAtK(corrupted, exact, 4))
      .forall { case (_, ne, nm, r) => ne == 4L && nm == 2L && r == 0.5 })
    // empty approx: 0.0, queries still reported (truth side drives)
    val none = recalls(Similarity.recallAtK(exact.where(lit(false)), exact, 4))
    assert(none.length == 8 && none.forall { case (_, ne, nm, r) =>
      ne == 4L && nm == 0L && r == 0.0 })
    // the documented malformed-approx robustness: repeated
    // (query, neighbor) rows must not inflate EITHER count — without
    // the internal distinct the left join would multiply exact rows
    val doubled = exact.unionByName(exact)
    assert(recalls(Similarity.recallAtK(doubled, exact, 4)) ==
      recalls(Similarity.recallAtK(exact, exact, 4)),
      "duplicated approx rows must measure identically to the clean frame")
    // rank > k rows are ignored on BOTH sides: measuring at k = 2
    // against the k = 4 truth uses only each side's top-2
    assert(recalls(Similarity.recallAtK(exact, exact, 2))
      .forall { case (_, ne, nm, r) => ne == 2L && nm == 2L && r == 1.0 })
    // the live loop: full-coverage IVF-PQ measures exactly 1.0 against
    // brute force; crippled settings measure strictly below average
    val ivf = Similarity.trainIvf(df, "embedding", nlist = 8, seed = 3L)
    val pq = Similarity.trainPq(df, "embedding", m = 4, ksub = 16, seed = 3L)
    val fullCoverage = Similarity.ivfPqTopK(df, queries, "vec_id", "embedding",
      k = 4, ivf, pq, nprobe = 8, refine = 50)
    assert(recalls(Similarity.recallAtK(fullCoverage, exact, 4)).forall(_._4 == 1.0),
      "full-coverage IVF-PQ must measure recall 1.0 against brute force")
    val crippled = Similarity.ivfPqTopK(df, queries, "vec_id", "embedding",
      k = 4, ivf, pq, nprobe = 1, refine = 1)
    val meanCrippled = recalls(Similarity.recallAtK(crippled, exact, 4))
      .map(_._4).sum / 8.0
    assert(meanCrippled < 1.0,
      s"nprobe=1/refine=1 should measure below 1.0, got $meanCrippled")
  }

  test("ivf-opq ANN: full probe + exhaustive refine equals brute force; pruned keeps recall") {
    val rng = new scala.util.Random(31)
    // cross-subspace-correlated bundles — the geometry OPQ exists for
    val vecs = (0 until 8).flatMap { c =>
      val base = Array.fill(4)(rng.nextGaussian().toFloat)
      val center = base ++ base.map(x => 0.9f * x) // dims 4..7 track 0..3
      (0 until 25).map(m =>
        (c * 25L + m, center.map(x => x + 0.1f * rng.nextGaussian().toFloat).toSeq))
    }
    val df = vecs.toDF("vec_id", "embedding").repartition(5)
    val queries = df.where($"vec_id" % 25 === 0)
    val (ivf, opq) = Similarity.trainIvfOpq(df, "embedding", nlist = 8, m = 4, ksub = 16,
      seed = 3L)
    val exact = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = Similarity
      .ivfOpqTopK(df, queries, "vec_id", "embedding", k = 5, ivf, opq, nprobe = 8, refine = 40)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(full == exact,
      "full-probe exhaustive-refine IVF-OPQ must equal brute force (rotation preserves cosines)")
    val pruned = Similarity
      .ivfOpqTopK(df, queries, "vec_id", "embedding", k = 5, ivf, opq, nprobe = 2, refine = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactPairs = exact.map(t => (t._1, t._2))
    val recall = pruned.intersect(exactPairs).size.toDouble / exactPairs.size
    assert(recall > 0.7, s"recall@5 nprobe=2 refine=4: $recall")
  }

  test("bruteForceNearDupPairs: distributed block equi-join ≡ driver-broadcast path bit-for-bit") {
    val rng = new scala.util.Random(17)
    val vecs = (0L until 60L).map(i => (i, Array.fill(8)(rng.nextGaussian().toFloat).toSeq))
    val df = vecs.toDF("vec_id", "embedding").repartition(5)
    val driver = Similarity
      .bruteForceNearDupPairs(df, "vec_id", "embedding", threshold = 0.3, maxBlockRows = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(driver.nonEmpty, "fixture must produce some near-dup pairs")
    val dist = Similarity
      .bruteForceNearDupPairs(df, "vec_id", "embedding", threshold = 0.3, maxBlockRows = 16,
        maxDriverRows = 0L)
    val p = dist.queryExecution.executedPlan.toString
    assert(p.contains("Join"), s"fallback must be a join, not collected blocks:\n$p")
    val got = dist.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // cosines compare with == : both paths share the exact accumulation order
    assert(got == driver, s"missing=${driver -- got} extra=${got -- driver}")
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

  test("trainIvfPq: one shared sample, models bit-identical to the separate trainIvf/trainPq calls") {
    // the r21 single-scan optimization's contract: trainIvf and
    // trainPq draw the IDENTICAL seeded reservoir sample, so the
    // combined trainer (one corpus-sample scan instead of two) must
    // return byte-equal models — any drift here would silently move
    // every store-served gate
    val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val (ivfC, pqC) = Similarity.trainIvfPq(emb, "embedding", nlist = 16, m = 8, ksub = 16)
    val ivfS = Similarity.trainIvf(emb, "embedding", nlist = 16)
    val pqS = Similarity.trainPq(emb, "embedding", m = 8, ksub = 16)
    assert(ivfC.centroids.length == ivfS.centroids.length)
    ivfC.centroids.zip(ivfS.centroids).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), "IVF centroid drift between combined and separate training")
    }
    assert(pqC.m == pqS.m && pqC.ksub == pqS.ksub && pqC.dsub == pqS.dsub)
    assert(java.util.Arrays.equals(pqC.codebooks, pqS.codebooks),
      "PQ codebook drift between combined and separate training")
    // the empty-corpus contract carries over unchanged: explicit empty
    // IVF model, degenerate 1×1 PQ model
    val (ivfE, pqE) = Similarity.trainIvfPq(
      emb.where(col("vec_id") < 0), "embedding", nlist = 16, m = 8, ksub = 16)
    assert(ivfE.centroids.isEmpty)
    assert(pqE.m == 1 && pqE.ksub == 1)
  }
}
