package graft

import graft.operators.Sketches

class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  test("heavy hitters exact regime: capacity ≥ distinct ⇒ exact counts") {
    val keys = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(7)("c") ++ Seq.fill(3)("d")
    val df = scala.util.Random.shuffle(keys).map(Tuple1(_)).toDF("k").repartition(6)
    val out = Sketches
      .heavyHitters(df, "k", capacity = 100, topN = 10)
      .as[(String, Long)]
      .collect()
      .toSeq
    assert(out == Seq(("a", 50L), ("b", 30L), ("c", 7L), ("d", 3L)))
  }

  test("heavy hitters approximate regime: MG guarantees under capacity pressure") {
    // skewed stream: h1×500, h2×300, 700 distinct singletons; N = 1500
    val keys = Seq.fill(500)("h1") ++ Seq.fill(300)("h2") ++ (1 to 700).map(i => s"t$i")
    val rng = new scala.util.Random(3)
    val df = rng.shuffle(keys).map(Tuple1(_)).toDF("k").repartition(8)
    val capacity = 10
    val out = Sketches
      .heavyHitters(df, "k", capacity, topN = capacity)
      .as[(String, Long)]
      .collect()
      .toMap
    val n = keys.length
    // merging P partition summaries can each lose up to N_p/(cap+1);
    // the mergeable-summaries bound stays N/(capacity+1) TOTAL
    val bound = n / (capacity + 1)
    // guarantee 1: any key with true count > bound must be reported
    assert(out.contains("h1") && out.contains("h2"), s"heavy keys missing: ${out.keys}")
    // guarantee 2: counts never overestimate, and underestimate ≤ bound
    assert(out("h1") <= 500 && out("h1") >= 500 - bound, s"h1=${out("h1")}")
    assert(out("h2") <= 300 && out("h2") >= 300 - bound, s"h2=${out("h2")}")
    // the two real heavy hitters outrank every singleton
    val top2 = Sketches
      .heavyHitters(df, "k", capacity, topN = 2)
      .as[(String, Long)]
      .collect()
      .map(_._1)
      .toSet
    assert(top2 == Set("h1", "h2"), s"top2 = $top2")
  }

  test("countMinSketch: exact in the collision-free regime, incl. estimate column") {
    val df = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(7)("c"))
      .map(Tuple1(_))
      .toDF("k")
      .repartition(4)
    val model = Sketches.countMinSketch(df, "k", depth = 4, width = 1 << 12)
    assert(model.estimate("a") == 50L && model.estimate("b") == 30L && model.estimate("c") == 7L)
    assert(model.estimate("never-seen") == 0L)
    val est = Sketches
      .cmsEstimates(df.distinct(), "k", model)
      .as[(String, Long)]
      .collect()
      .toMap
    assert(est == Map("a" -> 50L, "b" -> 30L, "c" -> 7L))
  }

  test("countMinSketch: never undercounts under heavy collision") {
    val truth = (0 until 200).map(i => s"k$i" -> (i % 7 + 1).toLong).toMap
    val rows = truth.toSeq.flatMap { case (k, n) => Seq.fill(n.toInt)(k) }
    val df = rows.map(Tuple1(_)).toDF("k").repartition(8)
    // width 16 forces collisions on 200 keys
    val model = Sketches.countMinSketch(df, "k", depth = 2, width = 16)
    truth.foreach { case (k, n) =>
      assert(model.estimate(k) >= n, s"$k undercounted: ${model.estimate(k)} < $n")
    }
    // total mass per row of the grid equals the stream length
    val n = rows.size
    (0 until 2).foreach { r =>
      assert(model.table.slice(r * 16, (r + 1) * 16).sum == n.toLong)
    }
  }

  test("countMinSketch: sketches merge to the union's sketch; nulls skipped") {
    val a = Seq("x", "x", "y", null).map(Tuple1(_)).toDF("k")
    val b = Seq("y", "z").map(Tuple1(_)).toDF("k")
    val sa = Sketches.countMinSketch(a, "k", depth = 3, width = 64)
    val sb = Sketches.countMinSketch(b, "k", depth = 3, width = 64)
    val merged = sa.merge(sb)
    val whole = Sketches.countMinSketch(a.unionByName(b), "k", depth = 3, width = 64)
    assert(merged.table.toSeq == whole.table.toSeq)
    assert(merged.estimate("x") == 2L && merged.estimate("y") == 2L && merged.estimate("z") == 1L)
    assert(sa.table.sum == 3L * 3) // null contributed nothing (3 non-null rows × depth)
  }

  test("hyperLogLog: estimates within the theoretical band across magnitudes") {
    // σ ≈ 1.04/√m; deterministic per (p, seed), so assert a 3σ band
    for (n <- Seq(100, 1000, 20000)) {
      val df = (1 to n).map(i => Tuple1(s"key-$i")).toDF("k").repartition(8)
      val est = Sketches.hyperLogLog(df, "k", p = 12).distinctEstimate
      val tol = math.max(3.0 * 1.04 / math.sqrt(1 << 12) * n, 3.0)
      assert(math.abs(est - n) <= tol, s"n=$n est=$est tol=$tol")
    }
  }

  test("hyperLogLog: slice sketches max-merge to the union's sketch bit-for-bit") {
    val a = (1 to 500).map(i => Tuple1(s"a$i")).toDF("k").repartition(4)
    val b = (1 to 500).map(i => Tuple1(if (i <= 250) s"a$i" else s"b$i")).toDF("k").repartition(3)
    val sa = Sketches.hyperLogLog(a, "k", p = 10)
    val sb = Sketches.hyperLogLog(b, "k", p = 10)
    val merged = sa.merge(sb)
    val whole = Sketches.hyperLogLog(a.unionByName(b), "k", p = 10)
    assert(merged.registers.toSeq == whole.registers.toSeq,
      "max-merged registers must equal the union's registers")
    // merge is idempotent on overlap: a ∪ a = a
    assert(sa.merge(sa).registers.toSeq == sa.registers.toSeq)
  }

  test("hllDistinctByGroup: per-group estimates match whole-frame sketches; nulls skipped") {
    val rows = (1 to 400).map(i => ("g1", s"u${i % 80}")) ++
      (1 to 300).map(i => ("g2", s"v${i % 200}")) ++
      Seq(("g1", null), ("g2", null))
    val df = rows.toDF("g", "k").repartition(6)
    val out = Sketches
      .hllDistinctByGroup(df, "g", "k", p = 12)
      .as[(String, Long)]
      .collect()
      .toMap
    // the UDAF path must agree exactly with the single-frame sketch of each slice
    for ((g, exact) <- Seq(("g1", 80), ("g2", 200))) {
      val solo = Sketches
        .hyperLogLog(df.where($"g" === g && $"k".isNotNull), "k", p = 12)
        .distinctEstimate
      assert(out(g) == solo, s"group $g: udaf=${out(g)} solo=$solo")
      val tol = math.max(3.0 * 1.04 / math.sqrt(1 << 12) * exact, 3.0)
      assert(math.abs(out(g) - exact) <= tol, s"group $g est=${out(g)} exact=$exact")
    }
  }

  test("kll exact regime: no compaction ⇒ quantiles are exact order statistics, any merge order") {
    val rng = new scala.util.Random(5)
    val vals = Array.fill(3000)(rng.nextDouble() * 100)
    val df = vals.toSeq.map(Tuple1(_)).toDF("v").repartition(7)
    val sk = Sketches.kllSketch(df, "v", k = 4096)
    assert(sk.n == 3000L)
    val sorted = vals.sorted
    for (q <- Seq(0.1, 0.25, 0.5, 0.75, 0.9, 1.0)) {
      val want = sorted(math.ceil(q * vals.length).toInt - 1)
      assert(sk.quantile(q) == want, s"q=$q")
    }
    // a different partitioning merges in a different order — exact
    // regime must not care
    val sk2 = Sketches.kllSketch(df.repartition(3), "v", k = 4096)
    assert(Seq(0.25, 0.5, 0.75).map(sk2.quantile) == Seq(0.25, 0.5, 0.75).map(sk.quantile))
  }

  test("kll compaction regime: rank error bounded, n exact, memory bounded") {
    val n = 40000
    val df = (1 to n).map(i => Tuple1(i.toDouble)).toDF("v").repartition(8)
    val sk = Sketches.kllSketch(df, "v", k = 256)
    assert(sk.n == n.toLong)
    // state is O(k), not O(n)
    assert(sk.levels.map(_.length).sum < 4 * 256, s"state ${sk.levels.map(_.length).sum}")
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val est = sk.quantile(q)
      val rankErr = math.abs(est - q * n) / n // values ARE their ranks here
      assert(rankErr <= 0.05, s"q=$q est=$est rank error $rankErr")
    }
  }

  test("kll compaction preserves total weight exactly (odd-length levels retain one item)") {
    // small k + adversarial odd sizes force many odd-length compactions
    for (n <- Seq(1001, 4097, 9999)) {
      val df = (1 to n).map(i => Tuple1(i.toDouble)).toDF("v").repartition(7)
      val sk = Sketches.kllSketch(df, "v", k = 64)
      assert(sk.n == n.toLong)
      val totalWeight = sk.levels.zipWithIndex.map { case (lvl, i) => lvl.length.toLong << i }.sum
      assert(totalWeight == n.toLong, s"n=$n weight drifted to $totalWeight")
      // with exact weights the q→rank scan can never run off the end;
      // q=1 lands on the largest retained item (within rank error of
      // the true max — compaction may drop the max itself)
      val est = sk.quantile(1.0)
      assert(math.abs(est - n) / n.toDouble <= 0.05, s"n=$n q=1 est=$est")
    }
  }

  test("kllQuantilesByGroup: exact per-group order statistics in the exact regime") {
    val rows = (1 to 500).map(i => ("a", i.toDouble)) ++ (1 to 200).map(i => ("b", i * 2.0))
    val df = rows.toDF("g", "v").repartition(5)
    val out = Sketches
      .kllQuantilesByGroup(df, "g", "v", qs = Seq(0.5, 1.0), k = 1024)
      .as[(String, Double, Double)]
      .collect()
      .map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(out("a") == ((250.0, 500.0)) && out("b") == ((200.0, 400.0)))
  }

  test("registerSql: hll_distinct and heavy_hitters usable from plain SQL") {
    graft.operators.Sketches.registerSql(spark, mgCapacity = 16)
    (Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ (1 to 60).map(i => s"u$i"))
      .map(Tuple1(_))
      .toDF("k")
      .createOrReplaceTempView("sketch_keys")
    val est = spark.sql("SELECT hll_distinct(k) AS d FROM sketch_keys")
      .as[Long].head()
    // 62 true distinct; p=12 → well within the 3σ band
    assert(math.abs(est - 62) <= math.max(3.0 * 1.04 / math.sqrt(1 << 12) * 62, 3.0), s"est=$est")
    val hh = spark
      .sql("SELECT explode(heavy_hitters(k)) AS e FROM sketch_keys")
      .selectExpr("e._1 AS key", "e._2 AS cnt")
      .as[(String, Long)]
      .collect()
      .toMap
    // exact-regime MG guarantees: the two heavy keys are present and
    // never overcounted (capacity 16 < 62 distinct → undercount ≤ N/17)
    assert(hh.contains("a") && hh.contains("b"))
    assert(hh("a") <= 40 && hh("a") >= 40 - 125 / 17)
  }

  test("keySkewProfile: shares and skew factors are exact") {
    val df = (Seq.fill(60)("hot") ++ Seq.fill(30)("warm") ++ Seq.fill(10)("cold"))
      .map(Tuple1(_))
      .toDF("k")
      .repartition(4)
    val out = Sketches
      .keySkewProfile(df, "k", topN = 3)
      .as[(String, Long, Double, Double)]
      .collect()
      .toSeq
    assert(out.map(r => (r._1, r._2)) == Seq(("hot", 60L), ("warm", 30L), ("cold", 10L)))
    val hot = out.head
    assert(hot._3 == 0.6 && hot._4 == 1.8, s"hot share/skew: $hot") // 3 keys, uniform share 1/3
  }
}
