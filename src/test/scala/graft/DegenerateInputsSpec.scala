package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators._

/** Degenerate-input hardening: at corpus scale, EMPTY slices (a filter
  * that matches nothing, an empty partition, a source with no new
  * data) and NULL text are routine inputs, not errors. Every operator
  * must return an empty/align-typed frame instead of throwing — a
  * driver-side crash on an empty slice would kill a 100 TB job that
  * was 99% done.
  */
class DegenerateInputsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emptyDocs: DataFrame = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType))))

  private lazy val nullTextDocs: DataFrame =
    Seq((1L, null: String), (2L, ""), (3L, "   "), (4L, "real content here with words"))
      .toDF("doc_id", "text")

  private lazy val emptyEmb: DataFrame = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)))))

  test("dedup family: empty corpus in, empty (not crashed) out") {
    assert(Dedup.exactDedup(emptyDocs, "doc_id", "text").count() == 0L)
    assert(Dedup.minHashNearDupPairs(emptyDocs, "doc_id", "text").count() == 0L)
    assert(Dedup.simHashNearDupPairs(emptyDocs, "doc_id", "text").count() == 0L)
    assert(Dedup.ngramJaccardPairs(emptyDocs, "doc_id", "text").count() == 0L)
    assert(Dedup.spanDedup(emptyDocs, "doc_id", "text").count() == 0L)
    assert(Dedup.lineDedup(emptyDocs, "doc_id", "text").count() == 0L)
    assert(Dedup.winnowingNearDupPairs(emptyDocs, "doc_id", "text").count() == 0L)
    assert(Dedup.cleanCorpus(emptyDocs, "doc_id", "text").count() == 0L)
  }

  test("dedup family: null/blank text rows survive or drop, never throw") {
    // exact dedup: null and blank are distinct contents; all rows surface
    assert(Dedup.exactDedup(nullTextDocs, "doc_id", "text").count() == 4L)
    // signature-based operators skip sub-shingle docs; no pairs, no crash
    assert(Dedup.minHashNearDupPairs(nullTextDocs, "doc_id", "text").count() == 0L)
    assert(Dedup.ngramJaccardPairs(nullTextDocs, "doc_id", "text").count() == 0L)
    val spans = Dedup.spanDedup(nullTextDocs, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(spans(1L) == "" && spans(4L) == "real content here with words")
    val lines = Dedup.lineDedup(nullTextDocs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(lines(1L) == "" && lines(4L) == "real content here with words")
  }

  test("similarity family: empty corpus trains degenerate models and searches empty") {
    val ivf = Similarity.trainIvf(emptyEmb, "embedding", nlist = 4)
    val pq = Similarity.trainPq(emptyEmb, "embedding", m = 2, ksub = 4)
    assert(Similarity.bruteForceTopK(emptyEmb, emptyEmb, "vec_id", "embedding", k = 5)
      .count() == 0L)
    assert(Similarity.ivfTopK(emptyEmb, emptyEmb, "vec_id", "embedding", k = 5, ivf)
      .count() == 0L)
    assert(Similarity.pqTopK(emptyEmb, emptyEmb, "vec_id", "embedding", k = 5, pq)
      .count() == 0L)
    assert(Similarity.semanticDedup(emptyEmb, "vec_id", "embedding", nlist = 4).count() == 0L)
  }

  test("text analysis family: empty and null-text inputs pass through typed") {
    assert(TextAnalysis.qualityScore(emptyDocs, "text").count() == 0L)
    assert(TextAnalysis.tokenQuantiles(emptyDocs, "text", Seq("doc_id")).count() == 0L)
    assert(TextAnalysis.commonNgramStats(emptyDocs, "doc_id", "text").count() == 0L)
    val q = TextAnalysis.qualityScore(nullTextDocs, "text")
    assert(q.count() == 4L, "null text scores as empty, not as a crash")
    assert(Lexical.termStats(emptyDocs, "doc_id", "text", Seq("spark")).count() == 0L)
    assert(Lexical.bm25TopK(emptyDocs, "doc_id", "text", Seq("spark")).count() == 0L)
  }

  test("round-9 faces: empty corpora and empty pools come back empty, never crash") {
    // binary ANN: empty corpus / empty queries both give empty results
    assert(Similarity.hammingTopK(emptyEmb, emptyEmb, "vec_id", "embedding", k = 5)
      .count() == 0L)
    val someEmb = Seq((1L, Seq(1f, -1f)), (2L, Seq(-1f, 1f))).toDF("vec_id", "embedding")
    assert(Similarity.hammingTopK(someEmb, emptyEmb, "vec_id", "embedding", k = 5)
      .count() == 0L)
    assert(Similarity.hammingTopK(emptyEmb, someEmb, "vec_id", "embedding", k = 5)
      .count() == 0L)
    val emptyIvf = Similarity.trainIvf(emptyEmb, "embedding", nlist = 4)
    assert(Similarity.ivfHammingTopK(emptyEmb, emptyEmb, "vec_id", "embedding", k = 5, emptyIvf)
      .count() == 0L)
    // canonicalize: null text stays null; empty corpus stays empty
    val canon = nullTextDocs
      .select(TextAnalysis.canonicalize(col("text")).as("c"))
      .collect()
      .map(r => Option(r.getString(0)))
    assert(canon.count(_.isEmpty) == 1 && canon.flatten.contains(""))
    assert(emptyDocs.select(TextAnalysis.canonicalize(col("text"))).count() == 0L)
    // hybrid retrieval: terms that match nothing → semantic-only results;
    // empty corpus → empty result
    val corpus = Seq(
      (1L, "alpha beta", Seq(1f, 0f)),
      (2L, "gamma delta", Seq(0f, 1f)),
    ).toDF("doc_id", "text", "embedding")
    val semOnly = Lexical
      .hybridTopK(corpus, "doc_id", "text", "embedding",
        Seq("nosuchterm"), Seq(1f, 0f), k = 2, poolSize = 2)
      .collect()
    assert(semOnly.length == 2 && semOnly.forall(_.isNullAt(1)), "lexical ranks must be null")
    val emptyCorpus = corpus.where(lit(false))
    assert(Lexical.hybridTopK(emptyCorpus, "doc_id", "text", "embedding",
      Seq("alpha"), Seq(1f, 0f), k = 2, poolSize = 2).count() == 0L)
  }

  test("sampling/packing family: empty inputs produce empty outputs") {
    val emptyToks = emptyDocs.select(col("doc_id"), lit(1L).as("n_tokens"))
      .where(lit(false))
    assert(Sampling.tokenBudgetSelect(emptyToks, "doc_id", "n_tokens",
      Seq(col("n_tokens").desc), 100L).count() == 0L)
    assert(Packing.sequencePackingByCount(emptyToks, "doc_id", "n_tokens", 512).count() == 0L)
    assert(Sketches.heavyHitters(emptyDocs.select(col("text").as("k")), "k", 8, topN = 5)
      .count() == 0L)
  }
}
