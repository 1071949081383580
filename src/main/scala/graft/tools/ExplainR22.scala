package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Packing, Similarity, TextAnalysis, VectorStore}

/** Evidence dumps for the round-22 optimizations, following the
  * [[ExplainSigWrite]] convention: build the INTERIOR frame both ways
  * — the pre-r22 spelling and the shipped one — over the same inputs,
  * and write each `.explain("formatted")` to a file so the committed
  * plan diff (exchange count, removed joins, removed sorts, standing
  * scans absent from a write) is checkable without running Spark.
  * Interior frames, per the r21 verdict's item 6: the declared gates
  * end in localCheckpoint, whose top-level dump is just
  * `Scan ExistingRDD`.
  *
  * Covered claims:
  *   1. unitDedup (lineDedup/paragraphDedup): winners + keep-decision
  *      share one exchange of the exploded units; carried columns ride
  *      the rebuild join (before: winners join + (id,p) anti-join +
  *      trailing attrs join).
  *   2. bucketedCandidatePairsRaw: bucket populations via one window
  *      (before: persist + groupBy count + join).
  *   3. webIngest chunk stage: attrs carried through the chunk fan-out
  *      (before: id-keyed join of the whole chunk frame).
  *   4. shuffleAndPack internal consumers: unordered layout frame
  *      (before: global orderBy(pos) = range-sampling job + range
  *      exchange + sort on the full output).
  *   5. VectorStore.merge: written frame is the increment only; the
  *      standing corpus is file-copied (before: union of the standing
  *      bucketed scans with the increment flowed through the bucketed
  *      writer's exchange+sort+encode).
  *
  * Usage: runMain graft.tools.ExplainR22 <sfDir> <outDir>
  */
object ExplainR22 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = java.nio.file.Paths.get(
      if (args.length > 1) args(1) else "plans/r22")
    java.nio.file.Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      // the before/after contrast must not hinge on broadcast-size
      // estimates at toy SF: the re-attach joins under audit are
      // corpus-sized on both sides at scale
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def dump(name: String, df: DataFrame): Unit = {
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted")).trim
      java.nio.file.Files.writeString(outDir.resolve(s"$name.txt"), txt + "\n")
      println(s"[explain] wrote $outDir/$name.txt")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))

    // ---------------------------------------------------- 1. unitDedup
    // BEFORE (pre-r22): winner aggregation over a FILTERED copy of the
    // exploded units, keep-decision via a key-join plus an (id, p)
    // anti-join, attrs re-attached by a second id-keyed corpus join.
    locally {
      val attrs = docs.select(col("id"), length(col("text")).as("doc_len"))
      val lines = docs
        .select(col("id"), posexplode(split(col("text"), "\n")))
        .withColumnRenamed("pos", "p")
        .withColumnRenamed("col", "line")
        .withColumn("key", trim(col("line")))
      val dedupable = lines.where(length(col("key")) >= 5)
      val winners = dedupable
        .groupBy("key")
        .agg(min(struct(col("id"), col("p"))).as("keep"), count(lit(1)).as("occ"))
        .where(col("occ") > 1)
        .select(col("key"), col("keep"))
      val removed = dedupable
        .join(winners, "key")
        .where(struct(col("id"), col("p")) =!= col("keep"))
        .select(col("id"), col("p"))
      val kept = lines.join(removed, Seq("id", "p"), "left_anti")
      val rebuilt = kept
        .groupBy("id")
        .agg(
          concat_ws("\n", collect_list(struct(col("p"), col("line")))
            .getField("line")).as("clean_text"),
          count(lit(1)).as("n_kept_lines"))
      val before = docs.select(col("id"))
        .join(rebuilt, Seq("id"), "left")
        .select(
          col("id"),
          coalesce(col("clean_text"), lit("")).as("clean_text"),
          coalesce(col("n_kept_lines"), lit(0L)).as("n_kept_lines"))
        .join(attrs, "id") // the pipeline's metadata re-attach
      dump("lineDedup_interior_before", before)
      // AFTER: the shipped spelling, attrs carried through the rebuild
      val after = Dedup.lineDedupCarry(
        docs.withColumn("doc_len", length(col("text"))),
        "id", "text", 5, Seq("doc_len"))
      dump("lineDedup_interior_after", after)
    }

    // ------------------------------------ 2. bucketedCandidatePairsRaw
    locally {
      val sigs = Dedup.minHashSignatures(docs, "id", "text")
      val banded = sigs.select(col("id"),
        explode(Dedup.bandKeysCol(128, 32)).as("bucket"))
      // BEFORE: persist + groupBy counts + join back, pairs off the
      // joined frame (the banded subtree feeds three consumers)
      val counts = banded.groupBy("bucket").agg(count(lit(1)).as("bucket_n"))
        .where(col("bucket_n").between(2L, 64L))
        .select("bucket")
      val keptB = banded.join(counts, "bucket")
      val pairsBefore = keptB
        .select(col("bucket"), col("id").as("id_a"))
        .join(keptB.select(col("bucket"), col("id").as("id_b")), "bucket")
        .where(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
      dump("bucketPairs_interior_before", pairsBefore)
      // AFTER: one window count over the bucket-keyed exchange
      val w = Window.partitionBy(col("bucket"))
      val keptA = banded
        .withColumn("__bucket_n", count(lit(1)).over(w))
        .where(col("__bucket_n").between(2L, 64L))
        .select(col("bucket"), col("id"))
      val pairsAfter = keptA
        .select(col("bucket"), col("id").as("id_a"))
        .join(keptA.select(col("bucket"), col("id").as("id_b")), "bucket")
        .where(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
      dump("bucketPairs_interior_after", pairsAfter)
    }

    // ------------------------------------------- 3+4. webIngest tail
    locally {
      val capped = docs.select(
        col("id"), col("text"),
        lower(col("text")).substr(1, 16).as("url_norm"),
        substring(col("text"), 1, 8).as("url_host"),
        lit("en").as("lang_pred"))
      val attrCols = Seq("url_norm", "url_host", "lang_pred")
      // BEFORE: bare chunk fan-out, attrs re-attached by an id-keyed
      // join of the whole chunk frame
      val attrs = capped.select(col("id") +: attrCols.map(col): _*)
      val chunksBefore = TextAnalysis
        .chunkTokens(capped, "id", "text", window = 64, stride = 64)
        .withColumn("chunk_id",
          concat(col("id").cast("string"), lit("#"), col("chunk_idx")))
        .join(attrs, "id")
      dump("webIngest_chunks_before", chunksBefore)
      // AFTER: carried columns — projection-only, no join anywhere
      val chunksAfter = TextAnalysis
        .chunkTokensCarry(capped, "id", "text", window = 64, stride = 64,
          carry = attrCols)
        .withColumn("chunk_id",
          concat(col("id").cast("string"), lit("#"), col("chunk_idx")))
      dump("webIngest_chunks_after", chunksAfter)
      // pack layout fed by the landed chunk frame: ordered (public
      // face — range-sampling job + range exchange + global sort on
      // the full output) vs unordered (the join-consumed internal
      // variant webIngest/prepareSequences now use)
      val landed = chunksAfter.localCheckpoint(true)
      val (orderedFrame, h1) = Packing.shuffleAndPackFrame(
        landed, "chunk_id", "n_chunk_tokens", 64, "epoch0", ordered = true)
      dump("shuffleAndPack_frame_before_ordered", orderedFrame)
      h1.unpersist(blocking = false)
      val (unorderedFrame, h2) = Packing.shuffleAndPackFrame(
        landed, "chunk_id", "n_chunk_tokens", 64, "epoch0", ordered = false)
      dump("shuffleAndPack_frame_after_unordered", unorderedFrame)
      h2.unpersist(blocking = false)
    }

    // --------------------------------------------- 5. VectorStore.merge
    locally {
      val rng = new scala.util.Random(7)
      val vecs = (0 until 8).flatMap { c =>
        val center = Array.fill(8)(rng.nextGaussian().toFloat)
        (0 until 25).map(m =>
          (c * 25L + m, center.map(x => x + 0.1f * rng.nextGaussian().toFloat).toSeq))
      }
      val df = vecs.toDF("vec_id", "embedding").repartition(4)
      val ivf = Similarity.trainIvf(df, "embedding", nlist = 8, seed = 3L)
      val pq = Similarity.trainPq(df, "embedding", m = 4, ksub = 16, seed = 3L)
      val dir = java.nio.file.Files.createTempDirectory("graft-explain-r22").toString
      VectorStore.write(df, "vec_id", "embedding", dir, "explain_r22_src", ivf, pq,
        numBuckets = 4)
      val src = VectorStore.read(spark, dir, "explain_r22_src")
      val inc = (1000L until 1020L).map(i =>
        (i, Array.fill(8)(rng.nextGaussian().toFloat).toSeq)).toDF("vec_id", "embedding")
      val landed = VectorStore
        .encodedProjection(inc, "vec_id", "embedding", src.ivf, src.pq)
        .localCheckpoint(true)
      // BEFORE: the bucketed writer consumed standing ∪ increment —
      // the standing bucketed tables are scanned, unioned, and
      // re-encoded/re-sorted by the write job on every epoch
      dump("vecstoreMerge_written_coded_before",
        src.coded.unionByName(landed.select("cell", "id", "code", "hcode")))
      dump("vecstoreMerge_written_vecs_before",
        src.vecs.unionByName(landed.select("id", "vec")))
      // AFTER: the writer consumes ONLY the landed increment; the
      // standing parquet part files are copied verbatim (bucket
      // membership rides the _NNNNN filename suffix; spec identical
      // by construction) — no standing scan anywhere in the write
      dump("vecstoreMerge_written_coded_after",
        landed.select("cell", "id", "code", "hcode"))
      dump("vecstoreMerge_written_vecs_after",
        landed.select("id", "vec"))
      spark.sql("DROP TABLE IF EXISTS explain_r22_src_coded")
      spark.sql("DROP TABLE IF EXISTS explain_r22_src_vecs")
    }

    spark.stop()
  }
}
