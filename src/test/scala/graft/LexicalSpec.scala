package graft

import org.apache.spark.sql.functions._

import graft.operators.Lexical

class LexicalSpec extends SparkTestBase {
  import spark.implicits._

  // tf/df/dl hand-countable by eye; "spark" saturates doc 1, misses doc 3
  private lazy val docs = Seq(
    (1L, "spark spark spark join hash"),
    (2L, "hash join hash window sort group"),
    (3L, "sort group order filter"),
    (4L, "spark window window"),
  ).toDF("doc_id", "text")

  test("termStats: exact tf/df/dl, only docs containing a query term") {
    val got = Lexical
      .termStats(docs, "doc_id", "text", Seq("spark", "hash", "window"))
      .as[(Long, String, Long, Long, Long)]
      .collect()
      .map { case (id, term, tf, df, dl) => (id, term) -> ((tf, df, dl)) }
      .toMap
    val expected = Map(
      (1L, "spark") -> ((3L, 2L, 5L)),
      (1L, "hash") -> ((1L, 2L, 5L)),
      (2L, "hash") -> ((2L, 2L, 6L)),
      (2L, "window") -> ((1L, 2L, 6L)),
      (4L, "spark") -> ((1L, 2L, 3L)),
      (4L, "window") -> ((2L, 2L, 3L)),
    )
    assert(got == expected, got.toString)
  }

  test("termStats: case-insensitive, duplicate query terms collapse, Unicode word tokenization") {
    val mixed = Seq((1L, "Spark, SPARK! spark."), (2L, "nothing here")).toDF("doc_id", "text")
    val got = Lexical
      .termStats(mixed, "doc_id", "text", Seq("SPARK", "spark"))
      .as[(Long, String, Long, Long, Long)]
      .collect()
    assert(got.toSeq == Seq((1L, "spark", 3L, 1L, 3L)), got.mkString(","))
  }

  test("bm25TopK: hand-computed single-term score, saturation orders tf correctly") {
    val got = Lexical
      .bm25TopK(docs, "doc_id", "text", Seq("spark"), k = 10)
      .as[(Long, Double, Long)]
      .collect()
      .map { case (id, score, hits) => id -> ((score, hits)) }
      .toMap
    assert(got.keySet == Set(1L, 4L), s"only docs with the term: $got")
    // N=4, df=2 → idf = ln(1 + 2.5/2.5) = ln 2; avgdl = 18/4 = 4.5
    val idf = math.log(2.0)
    def w(tf: Double, dl: Double) =
      idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / 4.5))
    assert(math.abs(got(1L)._1 - w(3, 5)) < 1e-9, s"doc1: ${got(1L)}")
    assert(math.abs(got(4L)._1 - w(1, 3)) < 1e-9, s"doc4: ${got(4L)}")
    assert(got(1L)._1 > got(4L)._1, "tf=3 outranks tf=1 at comparable dl")
    assert(got(1L)._2 == 1L && got(4L)._2 == 1L)
  }

  test("bm25TopK: multi-term sums per-term weights, k bounds output") {
    val got = Lexical
      .bm25TopK(docs, "doc_id", "text", Seq("spark", "hash", "window", "sort"), k = 2)
      .select("doc_id")
      .as[Long]
      .collect()
    assert(got.length == 2, s"k=2: ${got.mkString(",")}")
    // every doc hits ≥1 term; top-2 must be a subset of all docs
    assert(got.toSet.subsetOf(Set(1L, 2L, 3L, 4L)))
  }

  test("hybridTopK: RRF fuses both pools, lexical-only and semantic-only docs both surface") {
    // doc 1: lexical hit + vector far from the query
    // doc 3: no query terms + vector equal to the query (semantic-only)
    // doc 4: lexical hit + vector near the query (fused winner)
    val corpus = Seq(
      (1L, "spark spark spark join hash", Seq(0f, 1f, 0f)),
      (2L, "hash join hash window sort group", Seq(0f, 0.9f, 0.1f)),
      (3L, "sort group order filter", Seq(1f, 0f, 0f)),
      (4L, "spark window window", Seq(0.9f, 0.1f, 0f)),
    ).toDF("doc_id", "text", "embedding")
    val out = Lexical
      .hybridTopK(corpus, "doc_id", "text", "embedding",
        Seq("spark", "window"), Array(1f, 0f, 0f), k = 4, poolSize = 4)
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Long]), r.getDouble(3))))
      .toMap
    // semantic ranks: 3 (cos 1), then 4, then 2/1; lexical pool holds 1, 2, 4 only
    assert(out(3L)._1.isEmpty && out(3L)._2.contains(1L), s"doc 3: ${out(3L)}")
    assert(out(1L)._1.nonEmpty, "doc 1 must come from the lexical pool")
    assert(out(4L)._1.nonEmpty && out(4L)._2.contains(2L), s"doc 4: ${out(4L)}")
    // doc 4 is in both pools → its rrf beats any single-pool doc with worse ranks
    val rrf = out.map { case (id, (_, _, s)) => id -> s }
    assert(rrf(4L) > rrf(1L), s"fused doc must outrank lexical-only near peer: $rrf")
    // rrf arithmetic is exactly 1/(60+lex) + 1/(60+sem)
    out.foreach { case (id, (l, s, score)) =>
      val expect = l.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        s.map(r => 1.0 / (60 + r)).getOrElse(0.0)
      assert(score == expect, s"doc $id")
    }
  }

  test("termStats plan: no cartesian product, text never in the df aggregation") {
    val plan = Lexical
      .termStats(docs, "doc_id", "text", Seq("spark", "hash"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"must stay equi-join:\n$plan")
  }
}
