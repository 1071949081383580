package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = (1L to 1000L)
    .map(i => (i, if (i % 4 == 0) "de" else "en"))
    .toDF("doc_id", "lang")

  test("stratifiedSample: exact ceil(frac·n) quota per stratum, deterministic") {
    val s1 = Sampling.stratifiedSample(docs, "lang", "doc_id", 0.1)
    val counts = s1.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts("en") == 75, s"ceil(750·0.1): $counts") // 750 en docs
    assert(counts("de") == 25, s"ceil(250·0.1): $counts")
    val ids1 = s1.select("doc_id").as[Long].collect().sorted
    val ids2 = Sampling.stratifiedSample(docs, "lang", "doc_id", 0.1)
      .select("doc_id").as[Long].collect().sorted
    assert(ids1.sameElements(ids2), "same rows on every run")
    // monotone: a bigger fraction contains the smaller sample
    val ids3 = Sampling.stratifiedSample(docs, "lang", "doc_id", 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(ids1.forall(ids3.contains), "frac=0.1 sample ⊂ frac=0.2 sample")
  }

  test("hashSplit: total partition, roughly proportional, deterministic, schema preserved") {
    val split = Sampling.hashSplit(docs, "doc_id", Seq(0.8, 0.1, 0.1), Seq("train", "val", "test"))
    assert(split.columns.toSeq == Seq("doc_id", "lang", "split"))
    val counts = split.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 1000, "every row gets exactly one label")
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > 700 && counts("train") < 900, s"~80%: $counts")
    assert(counts("val") > 50 && counts("val") < 160, s"~10%: $counts")
    // same assignment every run (content-addressed, no RNG)
    val a = split.where($"split" === "val").select("doc_id").as[Long].collect().toSet
    val b = Sampling.hashSplit(docs, "doc_id", Seq(0.8, 0.1, 0.1), Seq("train", "val", "test"))
      .where($"split" === "val").select("doc_id").as[Long].collect().toSet
    assert(a == b)
  }

  test("near-1 fractions keep ~all rows: the rounded 65536 bound must clamp, not overflow") {
    // any fraction ≥ 1 − 1/131072 rounds to 65536; its unclamped %04x
    // form is the 5-char "10000", which sorts BELOW every md5 prefix
    // not starting with '0' — mixtureSample would keep ~6% where the
    // caller asked for ~100%, and hashSplit would dump ~94% of a
    // 0.999995-weight label onto the tail label
    val f = 0.999995
    val kept = Sampling
      .mixtureSample(docs, "lang", "doc_id", Map.empty, defaultFraction = f)
      .count()
    assert(kept == 1000L, s"fraction $f must keep ~every row, kept $kept")
    val split = Sampling
      .hashSplit(docs, "doc_id", Seq(f, 1 - f), Seq("train", "holdout"))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(split.getOrElse("train", 0L) == 1000L,
      s"a 5-per-million holdout must not swallow the corpus: $split")
    // SQL twins agree under the same near-1 weights
    docs.createOrReplaceTempView("clamp_docs")
    val sqlKept = spark.sql(
      s"SELECT count(*) FROM clamp_docs WHERE ${Sampling
          .mixtureSampleSql("lang", "doc_id", Map.empty, defaultFraction = f)
          .replace("VARCHAR", "STRING")}").as[Long].head()
    assert(sqlKept == kept)
  }

  test("hashSplitSql: a single label is a bare literal, not an empty CASE") {
    val sql = Sampling.hashSplitSql("doc_id", Seq(1.0), Seq("all"))
    docs.createOrReplaceTempView("single_docs")
    val labels = spark
      .sql(s"SELECT ${sql.replace("VARCHAR", "STRING")} AS s FROM single_docs")
      .select("s").distinct().as[String].collect().toSeq
    assert(labels == Seq("all"))
  }

  test("hashSplit SQL text agrees with the Column expression row-for-row") {
    docs.createOrReplaceTempView("split_docs")
    val viaSql = spark
      .sql(s"SELECT doc_id, ${Sampling.hashSplitSql("doc_id", Seq(0.5, 0.5), Seq("a", "b"))
          .replace("VARCHAR", "STRING")} AS split FROM split_docs")
      .as[(Long, String)].collect().toMap
    val viaCol = Sampling.hashSplit(docs, "doc_id", Seq(0.5, 0.5), Seq("a", "b"))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(viaSql == viaCol)
  }

  test("capPerStratum: oversized strata truncated deterministically, small strata intact") {
    val mixed = ((1L to 100L).map(i => (i, "big")) ++ (101L to 105L).map(i => (i, "small")))
      .toDF("doc_id", "source")
    val capped = Sampling.capPerStratum(mixed, "source", "doc_id", maxRows = 10)
    val counts = capped.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(counts == Map("big" -> 10L, "small" -> 5L), counts.toString)
    val ids1 = capped.select("doc_id").as[Long].collect().toSet
    val ids2 = Sampling.capPerStratum(mixed, "source", "doc_id", maxRows = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(ids1 == ids2, "same survivors every run")
    assert(capped.columns.toSeq == Seq("doc_id", "source"), "schema preserved")
  }

  test("mixtureSample: per-stratum fractions, 1.0 keeps all, 0.0/default drops all, stable subset") {
    val mixed = ((1L to 400L).map(i => (i, "web")) ++ (401L to 500L).map(i => (i, "books"))
      ++ (501L to 520L).map(i => (i, "junk"))).toDF("doc_id", "domain")
    val out = Sampling.mixtureSample(mixed, "domain", "doc_id",
      Map("web" -> 0.25, "books" -> 1.0))
    val counts = out.groupBy("domain").count().as[(String, Long)].collect().toMap
    assert(counts("books") == 100L, "frac 1.0 must keep every row")
    assert(!counts.contains("junk"), "default fraction 0 drops unlisted strata")
    assert(counts("web") > 60 && counts("web") < 140, s"~25% of 400: $counts")
    // kept set is a stable function of id: halving the fraction yields a subset
    val half = Sampling.mixtureSample(mixed, "domain", "doc_id", Map("web" -> 0.125))
      .select("doc_id").as[Long].collect().toSet
    val full = out.where($"domain" === "web").select("doc_id").as[Long].collect().toSet
    assert(half.subsetOf(full), "smaller fraction ⊂ larger fraction")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"mixture filter must not shuffle:\n$plan")
  }

  test("temperatureFractions: alpha=1 keeps natural shares, smaller alpha lifts the tail, budget caps at 1") {
    val df = ((1 to 900).map(i => (i.toLong, "head")) ++ (901 to 1000).map(i => (i.toLong, "tail")))
      .toDF("id", "lang")
    def shares(alpha: Double) = Sampling
      .temperatureFractions(df, "lang", alpha, budgetRows = 100)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val natural = shares(1.0)
    assert(natural("head")._1 == 900L && natural("tail")._1 == 100L)
    assert(math.abs(natural("head")._2 - 0.9) < 1e-12)
    assert(math.abs(natural("tail")._2 - 0.1) < 1e-12)
    val smoothed = shares(0.3)
    assert(smoothed("tail")._2 > natural("tail")._2, "smoothing must lift the tail share")
    assert(math.abs(smoothed("head")._2 + smoothed("tail")._2 - 1.0) < 1e-12)
    // a budget larger than any stratum can absorb caps the fraction at 1
    val roomy = Sampling
      .temperatureFractions(df, "lang", alpha = 0.3, budgetRows = 1000000)
      .collect()
      .map(_.getDouble(3))
    assert(roomy.forall(_ == 1.0))
    intercept[IllegalArgumentException](Sampling.temperatureFractions(df, "lang", 0.0, 10))
    // NULL strata are excluded, not a crash; empty input gives an empty table
    val withNull = df.withColumn("lang", when($"id" <= 10, lit(null: String)).otherwise($"lang"))
    val noNull = Sampling.temperatureFractions(withNull, "lang", 0.5, 100)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(noNull("head") == 890L && !noNull.contains(null))
    assert(Sampling.temperatureFractions(df.where($"id" < 0), "lang", 0.5, 100).count() == 0L)
  }

  test("temperatureSample: kept counts track the smoothed budget, deterministic across reruns") {
    val df = ((1 to 900).map(i => (i.toLong, "head")) ++ (901 to 1000).map(i => (i.toLong, "tail")))
      .toDF("id", "lang")
    val kept = Sampling.temperatureSample(df, "lang", "id", alpha = 0.5, budgetRows = 400)
    val counts = kept.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // shares at alpha=.5: 30/(30+10)=.75 and .25 → targets 300/100 (tail capped at its 100 rows);
    // md5-threshold keep is binomial around the target, so allow a wide band
    assert(counts("tail") == 100L, s"tail must be fully kept: $counts")
    assert(counts("head") > 200L && counts("head") < 400L, s"head ≈ 300: $counts")
    val again = Sampling.temperatureSample(df, "lang", "id", alpha = 0.5, budgetRows = 400)
    assert(again.select("id").collect().map(_.getLong(0)).toSet ==
      kept.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("hashSplit: shuffle-free plan (pure projection)") {
    val plan = Sampling
      .hashSplit(docs, "doc_id", Seq(0.9, 0.1), Seq("train", "test"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
  }

  test("tokenBudgetSelect: best-first prefix under budget, boundary row dropped") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (1L, 10L, 5L), // (id, tokens, quality)
      (2L, 10L, 9L),
      (3L, 10L, 7L),
      (4L, 10L, 9L), // ties with id 2 → id order breaks the tie
      (5L, 25L, 6L),
    ).toDF("id", "n_tokens", "quality")
    // order: q9(id2,10) q9(id4,20) q7(id3,30) q6(id5,55>40 dropped) q5(id1,40)
    val got = graft.operators.Sampling
      .tokenBudgetSelect(rows, "id", "n_tokens", Seq(col("quality").desc), budget = 40L)
      .select("id", "cum_tokens")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(2L -> 10L, 4L -> 20L, 3L -> 30L), got.toString)
  }

  test("tokenBudgetSelect: NULL tokens count as 0 — row kept, running total unchanged") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (1L, Some(10L), 9L),
      (2L, None, 8L), // NULL tokens: kept, consumes nothing (SQL window sum skips NULLs)
      (3L, Some(10L), 7L),
      (4L, Some(10L), 6L), // 30 > 25 → dropped
    ).toDF("id", "n_tokens", "quality")
    val got = graft.operators.Sampling
      .tokenBudgetSelect(rows, "id", "n_tokens", Seq(col("quality").desc), budget = 25L)
      .select("id", "n_tokens", "cum_tokens")
      .collect()
      .map(r => r.getLong(0) -> ((if (r.isNullAt(1)) None else Some(r.getLong(1))), r.getLong(2)))
      .toMap
    assert(got == Map(
      1L -> ((Some(10L), 10L)),
      2L -> ((None, 10L)), // n_tokens passes through un-coalesced; cum unchanged
      3L -> ((Some(10L), 20L)),
    ), got.toString)
  }

  test("leakageSafeSplit: near-dup partners always co-assign; singletons match plain hashSplit") {
    val docs = graft.sources.Tables.load(spark, Sf0001, "documents")
      .select($"doc_id", $"text")
    // plant a near-duplicate of every 5th doc (one appended token —
    // same construction the q66 gate uses, Jaccard ≫ 0.8)
    val copies = docs.where($"doc_id" % 5 === 0)
      .select(($"doc_id" + 1000000L).as("doc_id"), concat($"text", lit(" leakprobe")).as("text"))
    val corpus = docs.unionByName(copies)
    val split = graft.operators.Sampling
      .leakageSafeSplit(corpus, "doc_id", "text", Seq(0.8, 0.1, 0.1),
        Seq("train", "val", "test"))
      .select($"doc_id", $"component", $"split")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // every planted pair shares a component AND a split
    docs.where($"doc_id" % 5 === 0).select($"doc_id").as[Long].collect().foreach { id =>
      assert(split(id)._1 == split(id + 1000000L)._1, s"pair $id split across components")
      assert(split(id)._2 == split(id + 1000000L)._2, s"LEAK: pair $id split across sets")
    }
    // docs without any near-dup split exactly as the plain id hashSplit
    val paired = split.filter { case (id, (comp, _)) => comp != id }.keySet
    val plain = graft.operators.Sampling
      .hashSplit(corpus, "doc_id", Seq(0.8, 0.1, 0.1), Seq("train", "val", "test"))
      .select($"doc_id", $"split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val singletons = split.keySet -- paired
    assert(singletons.nonEmpty)
    singletons.foreach(id => assert(split(id)._2 == plain(id), s"singleton $id diverged"))
    // all three splits populated at plausible fractions
    val frac = split.values.groupBy(_._2).view.mapValues(_.size.toDouble / split.size).toMap
    assert(frac.keySet == Set("train", "val", "test"))
    assert(frac("train") > 0.6 && frac("val") < 0.25 && frac("test") < 0.25, frac.toString)
  }

  test("epochPlan: closed-form targets, cap engages, unweighted strata planned out") {
    // en: 750 docs × 10 tokens, de: 250 × 10; weights sum to exactly 1
    val corpus = (1L to 1000L)
      .map(i => (i, if (i % 4 == 0) "de" else "en", 10L))
      .toDF("doc_id", "lang", "n_tok")
    val plan = Sampling
      .epochPlan(corpus, "lang", "n_tok", Map("en" -> 0.75, "de" -> 0.25),
        budgetTokens = 30000L, maxEpochs = 4.0)
      .orderBy("stratum")
      .as[(String, Long, Long, Double, Double, Double, Double, Double)]
      .collect()
    val Array(de, en) = plan
    // en: target 22500 over 7500 tokens → exactly 3 epochs, no shortfall
    assert(en == (("en", 750L, 7500L, 0.75, 22500.0, 3.0, 22500.0, 0.0)), en)
    // de: target 7500 over 2500 tokens → wants 3, capped at... 3 < 4 → uncapped
    assert(de == (("de", 250L, 2500L, 0.25, 7500.0, 3.0, 7500.0, 0.0)), de)
    // tighter cap: de's target now unmet, shortfall exposed exactly
    val capped = Sampling
      .epochPlan(corpus, "lang", "n_tok", Map("en" -> 0.75, "de" -> 0.25),
        budgetTokens = 30000L, maxEpochs = 2.0)
      .where($"stratum" === "de")
      .select($"epochs", $"realized_tokens", $"shortfall_tokens")
      .as[(Double, Double, Double)].head()
    assert(capped == ((2.0, 5000.0, 2500.0)), capped)
    // a stratum with no weight emits no row; a weight with no stratum
    // still normalizes the others down
    val partial = Sampling
      .epochPlan(corpus, "lang", "n_tok", Map("en" -> 0.5, "xx" -> 0.5), 30000L)
      .select($"stratum", $"weight", $"target_tokens")
      .as[(String, Double, Double)].collect().toSeq
    assert(partial == Seq(("en", 0.5, 15000.0)), partial)
    // zero-token stratum plans to zero epochs instead of dividing by 0
    val zeroTok = Sampling
      .epochPlan(corpus.withColumn("n_tok", lit(0L)), "lang", "n_tok",
        Map("en" -> 1.0), 1000L)
      .select($"epochs").as[Double].head()
    assert(zeroTok == 0.0)
  }

  test("epochExpand: replica counts follow floor + md5-fraction; epoch ids contiguous") {
    val corpus = (1L to 1000L)
      .map(i => (i, if (i % 4 == 0) "de" else "en"))
      .toDF("doc_id", "lang")
    val out = Sampling
      .epochExpand(corpus, "lang", "doc_id", Map("en" -> 2.25, "de" -> 0.5))
      .select($"doc_id", $"lang", $"epoch")
      .collect()
      .groupBy(r => (r.getLong(0), r.getString(1)))
      .view.mapValues(_.map(_.getInt(2)).sorted.toSeq).toMap
    // en docs: 2 or 3 copies, epochs contiguous from 0; ~25% get the 3rd
    val enCounts = out.collect { case ((_, "en"), eps) => eps }
    assert(enCounts.forall(e => e == (0 until e.length) && (e.length == 2 || e.length == 3)))
    val third = enCounts.count(_.length == 3).toDouble / enCounts.size
    assert(third > 0.18 && third < 0.32, s"fractional-epoch rate $third")
    // de docs: 0 or 1 copy — the pure-downsample degenerate case
    // equals mixtureSample's keep set exactly
    val deKept = out.collect { case ((id, "de"), eps) => assert(eps == Seq(0)); id }.toSet
    val mixKept = Sampling
      .mixtureSample(corpus.where($"lang" === "de"), "lang", "doc_id", Map("de" -> 0.5))
      .select($"doc_id").as[Long].collect().toSet
    assert(deKept == mixKept, "e=0.5 must reduce to mixtureSample")
    // zero epochs drops the stratum entirely; integer epochs are exact
    val exact = Sampling
      .epochExpand(corpus, "lang", "doc_id", Map("en" -> 3.0, "de" -> 0.0))
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(exact == Map("en" -> 2250L), exact.toString)
    intercept[IllegalArgumentException] {
      Sampling.epochExpand(corpus, "lang", "doc_id", Map("en" -> 101.0))
    }
  }

  test("epochSample: one call from recipe to replicated corpus, plan and data consistent") {
    // en: 750 docs × 10 tok, de: 250 × 10; budget 15000 with weights
    // (0.5, 0.5) → en epochs = 1.0 exactly, de epochs = 3.0 exactly —
    // integer epochs make the expansion count closed-form
    val corpus = (1L to 1000L)
      .map(i => (i, if (i % 4 == 0) "de" else "en", 10L))
      .toDF("doc_id", "lang", "n_tok")
    val (plan, expanded) = Sampling
      .epochSample(corpus, "lang", "doc_id", "n_tok",
        Map("en" -> 0.5, "de" -> 0.5), budgetTokens = 15000L)
    val p = plan.select($"stratum", $"epochs").as[(String, Double)].collect().toMap
    assert(p == Map("en" -> 1.0, "de" -> 3.0), p.toString)
    val counts = expanded.groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(counts == Map("en" -> 750L, "de" -> 750L), counts.toString)
    // an unweighted stratum is planned out of the data too
    val (p2, e2) = Sampling
      .epochSample(corpus, "lang", "doc_id", "n_tok", Map("en" -> 1.0), 7500L)
    assert(p2.count() == 1L)
    assert(e2.where($"lang" === "de").count() == 0L)
  }

  test("epochExpand → shuffle: composite (id, epoch) key scatters replicas; bare id lands them adjacent") {
    val corpus = (1L to 200L).map(i => (i, "en")).toDF("doc_id", "lang")
    val expanded = Sampling
      .epochExpand(corpus, "lang", "doc_id", Map("en" -> 3.0))
      .withColumn("rep_id", concat($"doc_id", lit("#"), $"epoch"))
    // positions straight off the shuffle output (a join back on the
    // bare id would fan out 3×3); doc recovered from the key itself
    def positions(keyCol: String) = graft.operators.Packing
      .deterministicShuffle(expanded, keyCol, "r1")
      .select(split(col(keyCol).cast("string"), "#").getItem(0).cast("long"), $"pos")
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    // composite key: the three replicas of a doc are scattered — for
    // the overwhelming majority of docs no two replicas are adjacent
    // (600 positions; adjacency under a hash shuffle is ~1% per pair)
    val comp = positions("rep_id")
    assert(comp.values.forall(_.size == 3))
    val adjacentDocs = comp.count { case (_, ps) =>
      ps.sliding(2).exists(w => w(1) - w(0) == 1L) }
    assert(adjacentDocs < 20, s"composite key left $adjacentDocs/200 docs with adjacent replicas")
    // bare id: every doc's replicas share ONE shuffle key → the three
    // positions are consecutive — the failure mode the epoch column
    // plus a composite key exists to prevent
    val bare = positions("doc_id")
    assert(bare.values.forall(ps => ps.size == 3 && ps.last - ps.head == 2L),
      "bare-id shuffle must land replicas adjacent (same key)")
  }
}
