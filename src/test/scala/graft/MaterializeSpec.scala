package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Materialize, Sampling, Similarity}

/** The durable stage-boundary contract: every corpus-sized operator
  * output lands identically through the default LocalCheckpoint path
  * and the ParquetDir path (the preemptible-executor face), and the
  * ParquetDir frame really reads from the directory (restart point —
  * dropping the returned frame loses nothing).
  */
class MaterializeSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = graft.sources.Tables.load(spark, Sf0001, "documents")
  private lazy val emb = graft.sources.Tables.load(spark, Sf0001, "embeddings")

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-mat-$tag").resolve("out").toString

  test("cleanCorpus: ParquetDir output equals LocalCheckpoint output") {
    val local = Dedup.cleanCorpus(docs, "doc_id", "text", jaccardThreshold = 0.7)
    val dir = tmp("clean")
    val durable = Dedup.cleanCorpus(docs, "doc_id", "text", jaccardThreshold = 0.7,
      materialize = Materialize.ParquetDir(dir))
    assert(rows(local) == rows(durable))
    // the durable frame is backed by the directory, not executor blocks
    assert(durable.queryExecution.analyzed.toString.toLowerCase.contains("parquet"),
      s"ParquetDir result must be a file-source read:\n${durable.queryExecution.analyzed}")
    assert(rows(spark.read.parquet(dir)) == rows(local),
      "the directory itself is the restart point")
  }

  test("semanticDedup: ParquetDir output equals LocalCheckpoint output") {
    val local = Similarity.semanticDedup(emb, "vec_id", "embedding", nlist = 8, eps = 0.3)
    val dir = tmp("semdedup")
    val durable = Similarity.semanticDedup(emb, "vec_id", "embedding", nlist = 8, eps = 0.3,
      materialize = Materialize.ParquetDir(dir))
    assert(rows(local) == rows(durable))
    assert(rows(spark.read.parquet(dir)) == rows(local))
  }

  test("Materialize.Lazy: bm25TopK stays lazy at call time and matches the landed result") {
    val terms = Seq("data", "model", "training")
    val landed = graft.operators.Lexical.bm25TopK(docs, "doc_id", "text", terms, k = 10)
    spark.sparkContext.setJobGroup("graft-lazy-probe", "lazy-probe", false)
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup("graft-lazy-probe").length
    val lazyDf = graft.operators.Lexical.bm25TopK(
      docs, "doc_id", "text", terms, k = 10, materialize = Materialize.Lazy)
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup("graft-lazy-probe").length
    spark.sparkContext.clearJobGroup()
    assert(after == before,
      s"Materialize.Lazy must not trigger a job at call time (saw ${after - before})")
    assert(rows(lazyDf) == rows(landed),
      "lazy and landed faces must retrieve the same top-k")
  }

  test("tokenBudgetSelect: ParquetDir output equals LocalCheckpoint output") {
    val toks = docs.select(col("doc_id"), col("n_chars").cast("long").as("n_tokens"))
    val local = Sampling.tokenBudgetSelect(
      toks, "doc_id", "n_tokens", Seq(col("n_tokens").desc), 5000L)
    val dir = tmp("budget")
    val durable = Sampling.tokenBudgetSelect(
      toks, "doc_id", "n_tokens", Seq(col("n_tokens").desc), 5000L,
      materialize = Materialize.ParquetDir(dir))
    assert(rows(local) == rows(durable))
    assert(rows(spark.read.parquet(dir)) == rows(local))
  }
}
