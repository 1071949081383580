package graft

import graft.operators.Dsir

class DsirSpec extends SparkTestBase {
  import spark.implicits._

  private val targetVocab = "astro nova quasar pulsar nebula photon"
  private val rawVocab = "granite basalt schist gneiss marble slate"

  test("fitBucketCounts counts unigrams + bigrams exactly") {
    // "a b a" → unigrams a,b,a + bigrams "a b","b a" = 5 features;
    // plus "c c" → c,c + "c c" = 3. NULL text contributes nothing.
    val df = Seq(Some("a b a"), Some("c c"), None).map(Tuple1(_)).toDF("t").repartition(3)
    val (counts, total) = Dsir.fitBucketCounts(df, "t", buckets = 1 << 20)
    assert(total == 8L, s"total=$total")
    // collision-free at 2^20 buckets for 5 distinct features w.h.p.:
    // the count histogram must be {a→2, b→1, "a b"→1, "b a"→1, c→2, "c c"→1}
    assert(counts.filter(_ != 0).sorted.toSeq == Seq(1L, 1L, 1L, 1L, 2L, 2L))
  }

  test("importance weights order target-like above mixed above raw-like") {
    val target = (1 to 20).map(i => Tuple1(s"$targetVocab doc $i")).toDF("t")
    val raw = ((1 to 20).map(i => s"$targetVocab doc $i") ++
      (1 to 80).map(i => s"$rawVocab doc $i")).map(Tuple1(_)).toDF("t")
    val model = Dsir.fit(target, raw, "t")
    val pure = model.logWeight(targetVocab)
    val mixed = model.logWeight("astro nova granite basalt")
    val rawy = model.logWeight(rawVocab)
    assert(pure > mixed && mixed > rawy, s"pure=$pure mixed=$mixed raw=$rawy")
  }

  test("select: exactly k, deterministic, stable under repartitioning") {
    val docs = ((1 to 10).map(i => (i.toLong, s"$targetVocab t$i")) ++
      (11 to 100).map(i => (i.toLong, s"$rawVocab r$i"))).toDF("id", "t")
    val model = Dsir.fit(docs.where($"id" <= 10), docs, "t")
    val a = Dsir.select(docs.repartition(3), "id", "t", 10, model)
      .select("id").as[Long].collect().sorted.toSeq
    val b = Dsir.select(docs.repartition(17), "id", "t", 10, model)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b && a == (1L to 10L).toSeq, s"a=$a")
  }

  test("gumbel noise is a pure function of (id, seed); scale>0 still returns k rows") {
    assert(Dsir.gumbel("doc-1", 42L) == Dsir.gumbel("doc-1", 42L))
    assert(Dsir.gumbel("doc-1", 42L) != Dsir.gumbel("doc-1", 43L))
    assert(Dsir.gumbel("doc-1", 42L) != Dsir.gumbel("doc-2", 42L))
    val docs = (1 to 50).map(i => (i.toLong, if (i <= 25) targetVocab else rawVocab)).toDF("id", "t")
    val model = Dsir.fit(docs.where($"id" <= 25), docs, "t")
    val s1 = Dsir.select(docs, "id", "t", 20, model, gumbelScale = 1.0, seed = 9L)
      .select("id").as[Long].collect().toSet
    val s2 = Dsir.select(docs.repartition(7), "id", "t", 20, model, gumbelScale = 1.0, seed = 9L)
      .select("id").as[Long].collect().toSet
    assert(s1.size == 20 && s1 == s2, "seeded gumbel selection must be layout-independent")
    // with weights this separated, sampling still prefers the target block
    assert(s1.count(_ <= 25) >= 15, s"target hits: ${s1.count(_ <= 25)}")
  }

  test("planted recovery: held-out-fit top-k returns exactly the planted set") {
    // plants carry target markers, distractors raw markers, both atop
    // shared filler; fit sees only HALF the plants — selection must
    // still recover all of them (the markers generalize, not the ids)
    val shared = "the quick data pipeline runs batch jobs all day long"
    val docs = (1 to 200).map { i =>
      val marker = if (i % 4 == 0) targetVocab else rawVocab
      (i.toLong, s"$shared $marker x$i")
    }.toDF("id", "t").repartition(8)
    val fitSample = docs.where($"id" % 8 === 0) // half the plants
    val model = Dsir.fit(fitSample, docs, "t")
    val k = 50 // |{i : i % 4 == 0}|
    val got = Dsir.select(docs, "id", "t", k, model)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == (1 to 200).filter(_ % 4 == 0).map(_.toLong), s"got=$got")
  }
}
