package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize a larger scale factor from an existing one for LOCAL
  * perf probes (sf0.1 → sf1 by default): each replica shifts ids by
  * k·10⁸ and perturbs content so replicas are neither exact dups nor
  * unrelated — text gets a vowel-rotation (k mod 5) plus a trailing
  * replica token (so same-rotation replica pairs are near-dups: a
  * plausible ~1-partner near-dup rate, not a 10-clique of exact
  * copies that would distort dedup scaling), embeddings get one
  * component nudged by k·0.003 (cosine ≈ 1 to the original — small
  * semantic-dup clusters). Only `documents` and `embeddings` are
  * replicated (the heavy-query inputs); other tables copy through 1×.
  *
  * NOT test data — correctness oracles never read this; it exists so
  * sf0.1→sf1 scaling factors of the heaviest queries can be measured
  * before the driver ever runs them at scale.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = if (args.length > 1) args(1) else "/tmp/sf1"
    val reps = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rotations = Array("aeiou", "eioua", "iouae", "ouaei", "uaeio")

    val docs = graft.sources.Tables.load(spark, src, "documents")
    (0 until reps)
      .map { k =>
        val text =
          if (k == 0) col("text")
          else concat(translate(col("text"), "aeiou", rotations(k % 5)), lit(s" rep$k"))
        docs.select(
          (col("doc_id") + lit(k * 100000000L)).as("doc_id"),
          text.as("text"),
          col("lang"), col("source"),
          length(text).as("n_chars"))
      }
      .reduce(_ unionByName _)
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/documents.parquet")

    val emb = graft.sources.Tables.load(spark, src, "embeddings")
    (0 until reps)
      .map { k =>
        emb.select(
          (col("vec_id") + lit(k * 100000000L)).as("vec_id"),
          transform(col("embedding"),
            (x, i) => when(i === (k % 64), (x + lit(k * 0.003f)).cast("float")).otherwise(x))
            .as("embedding"),
          col("label"))
      }
      .reduce(_ unionByName _)
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/embeddings.parquet")

    // pass-through tables (1×): enough for queries that only join dims
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach { t =>
        spark.read.parquet(s"$src/$t.parquet")
          .write.mode(SaveMode.Overwrite).parquet(s"$dst/$t.parquet")
      }
    // events: replicated like documents so the event-time family
    // (sessionize, as-of, windowed rollups) sweeps too — each replica
    // shifts event_id AND user_id by k·10⁸, keeping ts: 10× the KEY
    // population at the same per-user event density, which is what a
    // bigger firehose looks like (more concurrent users, not one user
    // 10× chattier — the latter would just grow per-key state). Read
    // via the nanos-aware loader (Spark 4 rejects the raw
    // TIMESTAMP(NANOS) schema), lands as plain micros timestamps.
    val ev = graft.sources.Tables.events(spark, src)
    (0 until reps)
      .map { k =>
        ev.select(
          (col("event_id") + lit(k * 100000000L)).as("event_id"),
          col("ts"),
          (col("user_id") + lit(k * 100000000L)).as("user_id"),
          col("event_type"), col("value"), col("props"))
      }
      .reduce(_ unionByName _)
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/events.parquet")

    println(s"[scaleup] wrote $dst at ${reps}x of $src")
    spark.stop()
  }
}
