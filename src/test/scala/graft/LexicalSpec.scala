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

  test("termStats plan: no cartesian product, text never in the df aggregation") {
    val plan = Lexical
      .termStats(docs, "doc_id", "text", Seq("spark", "hash"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"must stay equi-join:\n$plan")
  }
}
