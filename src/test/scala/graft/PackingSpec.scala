package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Packing}

class PackingSpec extends SparkTestBase {
  import spark.implicits._

  test("sequencePacking: hand-checked layout incl. zero-token and short docs") {
    val df = Seq(
      (1L, "a b c d e"), // 5 tokens, offsets [0,5)
      (2L, ""), // 0 tokens at cursor 5
      (3L, "one two three four"), // 4 tokens, [5,9) → crosses pack edge at 8
      (4L, "x y z"), // 3 tokens, [9,12)
    ).toDF("doc_id", "text")
    val out = Packing
      .sequencePacking(df, "doc_id", "text", seqLen = 8)
      .as[(Long, Long, Long, Long, Long)]
      .collect()
      .toSeq
    assert(out == Seq(
      (1L, 5L, 0L, 0L, 0L),
      (2L, 0L, 5L, 0L, 0L),
      (3L, 4L, 5L, 0L, 1L), // spans packs 0 and 1 (tokens 5..8)
      (4L, 3L, 9L, 1L, 1L),
    ))
  }

  test("distributed prefix sum ≡ global single-partition window, many partitions") {
    val rng = new scala.util.Random(7)
    val rows = (1L to 3000L).map(i => (i, Seq.fill(rng.nextInt(20))("w").mkString(" ")))
    val df = rows.toDF("doc_id", "text").repartition(13)
    val got = Packing.sequencePacking(df, "doc_id", "text", 64)
    val tokens = df.select(
      col("doc_id"),
      coalesce(expr("size(filter(split(trim(text), '\\\\s+'), x -> x != ''))"), lit(0))
        .cast("long")
        .as("n_tokens"),
    )
    val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    val want = tokens
      .withColumn("start_offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_first", expr("start_offset div 64"))
      .withColumn(
        "pack_last",
        when(col("n_tokens") > 0, expr("(start_offset + n_tokens - 1) div 64"))
          .otherwise(col("pack_first")),
      )
      .orderBy("doc_id")
    assert(got.collect().toSeq == want.collect().toSeq)
    got.unpersist()
  }

  test("deterministicShuffle: valid permutation, salt-stable, salt-sensitive") {
    val df = (1L to 500L).map(i => (i, s"doc $i")).toDF("doc_id", "text").repartition(7)
    val a = Packing.deterministicShuffle(df, "doc_id", "epoch1")
    val b = Packing.deterministicShuffle(df, "doc_id", "epoch1")
    val c = Packing.deterministicShuffle(df, "doc_id", "epoch2")
    val posA = a.select("pos").as[Long].collect().sorted
    assert(posA.toSeq == (1L to 500L)) // a permutation: every position exactly once
    assert(a.collect().toSeq == b.collect().toSeq) // same salt → identical order
    val ca = c.select("doc_id", "pos").as[(Long, Long)].collect().toMap
    val aa = a.select("doc_id", "pos").as[(Long, Long)].collect().toMap
    assert(aa != ca, "different salt must reshuffle")
    // order agrees with an explicit sort by the hash key
    val byHash = a.orderBy("shuffle_key", "doc_id").select("pos").as[Long].collect()
    assert(byHash.toSeq == (1L to 500L), "pos must rank by shuffle_key")
    Seq(a, b, c).foreach(_.unpersist())
  }

  test("shuffleAndPack ≡ deterministicShuffle then sequencePackingByCount") {
    val rng = new scala.util.Random(23)
    val df = (1L to 800L)
      .map(i => (i, rng.nextInt(100).toLong))
      .toDF("doc_id", "n_tokens")
      .repartition(9)
    val fused = Packing
      .shuffleAndPack(df, "doc_id", "n_tokens", seqLen = 128, salt = "s")
      .select("doc_id", "shuffle_key", "pos", "n_tokens", "start_offset", "pack_first", "pack_last")
      .collect()
      .toSeq
    val shuffled = Packing.deterministicShuffle(df, "doc_id", "s")
    val packed = Packing.sequencePackingByCount(
      shuffled
        .withColumnRenamed("pos", "__pos")
        .join(df, "doc_id")
        .select(col("__pos"), col("n_tokens")),
      "__pos",
      "n_tokens",
      128,
    )
    val want = shuffled
      .join(packed.withColumnRenamed("__pos", "pos").withColumnRenamed("n_tokens", "nt"), "pos")
      .join(df, "doc_id")
      .select("doc_id", "shuffle_key", "pos", "n_tokens", "start_offset", "pack_first", "pack_last")
      .orderBy("pos")
      .collect()
      .toSeq
    assert(fused == want)
    Seq(shuffled, packed).foreach(_.unpersist())
  }

  test("exactDedupBest keeps the preferred row per content group") {
    val df = Seq(
      (1L, "same text", 9L),
      (2L, "same text", 20L), // longest copy → keeper despite higher id
      (3L, "same text", 20L), // tie on length → loses to id 2
      (4L, "unique", 6L),
    ).toDF("doc_id", "text", "n_chars")
    val out = Dedup
      .exactDedupBest(df, "doc_id", "text", Seq(col("n_chars").desc))
      .select("doc_id", "group_size", "is_kept")
      .as[(Long, Long, Boolean)]
      .collect()
      .sortBy(_._1)
      .toSeq
    assert(out == Seq((1L, 3L, false), (2L, 3L, true), (3L, 3L, false), (4L, 1L, true)))
  }

  test("packBestFit: BFD hand-check, no bin overflows, whole docs, oversize isolated") {
    // lengths 70,60,50,40,30,20 with seqLen 100 → best-fit (desc):
    // 70→bin0; 60→bin1; 50→bin2; 40(70+40>100)→bin1(60+40=100); 30→bin0(=100); 20→bin2(=70)
    val df = Seq((1L, 70L), (2L, 60L), (3L, 50L), (4L, 40L), (5L, 30L), (6L, 20L), (7L, 150L))
      .toDF("doc_id", "n")
    val out = Packing.packBestFit(df, "doc_id", "n", seqLen = 100)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3))))
      .toMap
    val bins = out.values.map(_._1).toSet
    // oversized doc 7 ranks first (150 desc) and fills its own bin
    assert(out(7L)._2 && out.filter(_._1 != 7L).values.forall(!_._2))
    assert(out.count { case (_, (b, _)) => b == out(7L)._1 } == 1, "oversize bin is dedicated")
    // every bin's clipped fill ≤ seqLen
    val fills = Seq(1L -> 70L, 2L -> 60L, 3L -> 50L, 4L -> 40L, 5L -> 30L, 6L -> 20L, 7L -> 100L)
      .groupMapReduce { case (id, _) => out(id)._1 } { case (_, n) => n }(_ + _)
    assert(fills.values.forall(_ <= 100L), fills.toString)
    // BFD on this instance is optimal: 3 bins for the fitting docs + the oversize bin
    assert(bins.size == 4, s"bins=$bins")
    val eff = Packing.packEfficiency(Packing.packBestFit(df, "doc_id", "n", 100), 100).head()
    assert(eff.getAs[Long]("n_docs") == 7L && eff.getAs[Long]("n_packs") == 4L)
    assert(eff.getAs[Long]("total_tokens") == 370L && eff.getAs[Long]("capacity") == 400L)
    assert(math.abs(eff.getAs[Double]("padding_fraction") - 0.075) < 1e-12)
  }

  test("packBestFit: deterministic under repartitioning; segments bound bins and memory") {
    val rng = new scala.util.Random(41)
    val df = (1L to 300L).map(i => (i, 10L + rng.nextInt(90))).toDF("doc_id", "n")
    val a = Packing.packBestFit(df, "doc_id", "n", seqLen = 128, groupSize = 32)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
    val b = Packing.packBestFit(df.repartition(7), "doc_id", "n", seqLen = 128, groupSize = 32)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
    assert(a == b, "pack assignment must not depend on input layout")
    // per-bin fills never exceed seqLen; bins stay inside their segment's id range
    val byBin = Packing.packBestFit(df, "doc_id", "n", seqLen = 128, groupSize = 32)
      .groupBy("pack_id").agg(sum(least(col("n_tokens"), lit(128L))).as("fill"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(byBin.forall(_._2 <= 128L))
    assert(byBin.map(_._1).distinct.length == byBin.length)
  }
}
