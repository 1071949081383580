package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical (keyword) retrieval over a document corpus — the BM25
  * complement to [[Similarity]]'s embedding search. The reference
  * engine's users run both lexical and vector retrieval over the same
  * tables; this gives the lexical half the same distributed shape:
  * a posting-list scan bounded by the query's terms, never a corpus
  * pass per query term.
  *
  * Tokenization matches the rest of the text stack (lowercase, split
  * on `[^\p{L}\p{N}_]+`, drop empties) so term statistics compose with
  * [[TextAnalysis.tokenVocabulary]] and the dedup shingle kernels.
  */
object Lexical {

  private def tokens(textCol: String) =
    filter(split(lower(col(textCol)), graft.textutil.TextHash.WordSplitRe), t => t =!= lit(""))

  /** Exact per-(document, term) retrieval statistics for a fixed term
    * set: term frequency `tf`, corpus-wide document frequency `df`,
    * and document length `dl` (total word tokens). These are the
    * integer inputs BM25/TF-IDF scoring is computed from — kept as a
    * separate face because they are exactly reproducible in any SQL
    * engine (pure counts, no logarithms), so correctness of the whole
    * retrieval pipeline below the scoring arithmetic oracle-checks.
    *
    * Scale shape: the corpus scan keeps only query-term postings
    * (`array_intersect` against a literal array prunes before the
    * explode, so the exploded stream is |docs| × |query terms| at
    * worst, not the token stream); `df` is one aggregation over that
    * same narrow stream joined back by term — text never shuffles.
    * Emits only documents containing at least one query term.
    */
  /** ONE-tokenize projection shared by [[termStats]] and [[bm25TopK]]:
    * per document, `dl` (token count; NULL for NULL text) and `__tt`
    * — the ≤|query terms| matched (term, tf) structs, computed INSIDE
    * the generator expression so the token array is evaluated once
    * per document and never leaves the projection. Rows without
    * matches carry an empty `__tt` (NULL text → NULL), so corpus-wide
    * stats (n_docs, avgdl) and the posting stream both derive from
    * THIS frame — the corpus text is tokenized exactly once.
    */
  private def perDocPostings(
      df: DataFrame, idCol: String, textCol: String, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    df.select(col(idCol).as("doc_id"), tokens(textCol).as("__toks"))
      .select(
        col("doc_id"),
        size(col("__toks")).cast("bigint").as("dl"),
        matchedTermStructs(col("__toks"), terms).as("__tt"),
      )
  }

  /** The matched-(term, tf) struct array of a token-array column for a
    * fixed query-term set — the ONE Column builder [[perDocPostings]]
    * and [[termStats]] share, so the two faces cannot drift on
    * matching semantics (the shapes around it differ deliberately:
    * see [[postingStream]]'s eager-vs-generator caveat).
    */
  private def matchedTermStructs(
      toks: org.apache.spark.sql.Column, terms: Seq[String]): org.apache.spark.sql.Column = {
    val qTerms = array(terms.distinct.map(t => lit(t.toLowerCase)): _*)
    transform(
      array_intersect(array_distinct(toks), qTerms),
      t => struct(
        t.as("term"),
        size(filter(toks, x => x === t)).cast("bigint").as("tf")))
  }

  /** Explode [[perDocPostings]] to the narrow (doc_id, dl, term, tf)
    * posting stream (docs without matches drop here). For LANDED
    * frames only (bm25TopK's materialized projection): exploding a
    * computed `__tt` alias through a separate Project lets the
    * optimizer split the tokenize between the projection (dl) and the
    * inlined generator input, re-running the corpus regex — measured
    * 1.55× on q63 when [[termStats]] routed here unlanded (the r13→r15
    * q63 regression, bisected to `ce6e2d6`); on a landed frame `__tt`
    * is already bytes, so nothing re-evaluates.
    */
  private def postingStream(perDoc: DataFrame): DataFrame =
    perDoc
      .select(col("doc_id"), col("dl"), explode(col("__tt")).as("__tt"))
      .select(col("doc_id"), col("dl"), col("__tt.term").as("term"), col("__tt.tf").as("tf"))

  def termStats(df: DataFrame, idCol: String, textCol: String, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    // the (term, tf) transform sits INSIDE the generator of the SAME
    // select that computes dl — the one shape where the token array is
    // provably evaluated once per document (see [[postingStream]]'s
    // caveat; this is the pre-`ce6e2d6` formulation, restored after
    // the q63 bisect)
    val perDoc = df
      .select(col(idCol).as("doc_id"), tokens(textCol).as("__toks"))
      .select(
        col("doc_id"),
        size(col("__toks")).cast("bigint").as("dl"),
        explode(matchedTermStructs(col("__toks"), terms)).as("__tt"),
      )
      .select(col("doc_id"), col("dl"), col("__tt.term").as("term"), col("__tt.tf").as("tf"))
    val termDf = perDoc.groupBy("term").agg(count(lit(1)).as("df"))
    perDoc
      .join(termDf, "term")
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("dl"))
  }

  /** BM25 top-k document retrieval for one query (a bag of terms).
    * Okapi BM25 with the standard Robertson/Sparck-Jones idf
    * (`ln(1 + (N - df + 0.5)/(df + 0.5))`, always positive), k1/b
    * defaults per Robertson & Zaragoza 2009.
    *
    * Scale shape: [[termStats]]'s pruned posting scan, a broadcast of
    * the (|query terms|)-row df table, one per-doc sum, then
    * `TakeOrderedAndProject` for the global top-k — the driver sees k
    * rows, executors each sort only their partition's candidates.
    * Scoring arithmetic is floating-point (ln), so the exact-integer
    * [[termStats]] face is the oracle surface, not the score.
    *
    * EAGERNESS: the default `materialize = LocalCheckpoint` lands the
    * shared per-doc posting projection at CALL time (a Spark job runs
    * before this method returns, and the landed blocks are
    * executor-local, i.e. not fault-tolerant) so the corpus-wide
    * tokenization — the dominant cost — runs once instead of once per
    * consumer subtree. Callers that need classic lazy-DataFrame
    * semantics (no job until an action) pass [[Materialize.Lazy]] and
    * accept the double tokenization pass; callers on preemptible
    * executors pass [[Materialize.ParquetDir]] for a durable landing.
    */
  def bm25TopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75,
      materialize: Materialize = Materialize.LocalCheckpoint,
  ): DataFrame = {
    // land the narrow per-doc projection ONCE (doc_id, dl, matched
    // structs — no token arrays) and derive BOTH the corpus stats and
    // the posting stream from it: the corpus-wide regex tokenization
    // — the dominant cost of retrieval — runs one pass, not the two
    // passes the earlier separate corpusAgg/termStats subtrees paid
    val landed = Materialize(perDocPostings(df, idCol, textCol, terms), materialize)
    val corpusAgg = landed.agg(
      count(lit(1)).as("n_docs"),
      avg(col("dl").cast("double")).as("avgdl"),
    )
    val perDoc = postingStream(landed)
    val termDf = perDoc.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = perDoc
      .join(termDf, "term")
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("dl"))
    val scored = stats
      .crossJoin(broadcast(corpusAgg))
      .withColumn(
        "idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))),
      )
      .withColumn(
        "w",
        col("idf") * (col("tf") * (lit(k1) + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))),
      )
    scored
      .groupBy("doc_id")
      .agg(sum(col("w")).as("score"), count(lit(1)).as("n_terms_hit"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Hybrid lexical + semantic retrieval via reciprocal-rank fusion
    * (Cormack, Clarke & Büttcher, SIGIR 2009):
    * `rrf(d) = Σ_pools 1/(c + rank_pool(d))` over the BM25 pool and
    * the exact-cosine pool, missing-pool contribution 0. RRF is the
    * standard robust fusion for RAG retrieval — rank arithmetic only,
    * so no score normalization across incomparable scales is needed,
    * and the fused result is exactly engine-portable (ranks are
    * integers; `1/(c+rank)` is one IEEE division; gate q112 replays
    * the whole pipeline).
    *
    * Scale shape: each pool is its own already-scale-correct face
    * (BM25 = pruned posting scan; cosine = broadcast query +
    * bounded-heap reduction); the fusion joins two ≤poolSize row sets
    * — driver-trivial, executed distributed. The rank windows run
    * over poolSize rows, not the corpus.
    *
    * Output: (doc_id, lex_rank, sem_rank, rrf_score), top-k by
    * (rrf_score desc, doc_id asc); null rank = absent from that pool.
    *
    * Precondition: corpus ids are non-negative (the repo-wide id
    * convention) — the internal query row uses id −1, and a corpus
    * document with that id would be excluded from the semantic pool
    * by the self-match rule.
    */
  def hybridTopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      vecCol: String,
      terms: Seq[String],
      queryVec: Array[Float],
      k: Int = 10,
      poolSize: Int = 50,
      rrfC: Int = 60,
  ): DataFrame = {
    require(poolSize >= k, s"poolSize ($poolSize) must be >= k ($k)")
    val spark = df.sparkSession
    import spark.implicits._
    val lex = bm25TopK(df, idCol, textCol, terms, poolSize)
      .withColumn(
        "lex_rank",
        row_number()
          .over(Window.orderBy(col("score").desc, col("doc_id")))
          .cast("bigint"))
      .select(col("doc_id"), col("lex_rank"))
    // sentinel query id -1: outside any corpus id space, so the
    // brute-force self-match exclusion never fires — the query
    // vector's own source document ranks (cosine 1) like any other
    val qdf = Seq((-1L, queryVec)).toDF(idCol, vecCol)
    val sem = Similarity
      .bruteForceTopK(df.select(col(idCol), col(vecCol)), qdf, idCol, vecCol, poolSize)
      .select(col("neighbor_id").as("doc_id"), col("rank").as("sem_rank"))
    lex
      .join(sem, Seq("doc_id"), "full_outer")
      .select(
        col("doc_id"),
        col("lex_rank"),
        col("sem_rank"),
        (coalesce(lit(1.0) / (lit(rrfC) + col("lex_rank")), lit(0.0))
          + coalesce(lit(1.0) / (lit(rrfC) + col("sem_rank")), lit(0.0))).as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
      .limit(k)
  }
}
