package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Evidence dump for the r21 `writeSignatures` rewrite: build the
  * banded-table frame BOTH ways over the same signature plan — the
  * pre-r21 groupBy + self-join spelling and the shipped single-window
  * spelling — and write each `.explain("formatted")` to a file, so
  * the committed plan diff (exchange count, duplicated signature
  * subtree) is checkable without running Spark.
  *
  * Usage: runMain graft.tools.ExplainSigWrite <sfDir> <outDir>
  */
object ExplainSigWrite {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = java.nio.file.Paths.get(
      if (args.length > 1) args(1) else "plans/r21")
    java.nio.file.Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // the UNLANDED signature plan, as every pre-r21 caller passed it
    val sigs = graft.operators.Dedup.minHashSignatures(docs, "doc_id", "text")
    val banded0 = sigs.select(col("id"),
      explode(graft.operators.Dedup.bandKeysCol(128, 32)).as("bucket"))
    // BEFORE: groupBy + self-join (the signature subtree appears twice)
    val counts = banded0.groupBy("bucket").agg(count(lit(1)).as("bucket_n"))
    val before = banded0.join(counts, "bucket")
      .where(col("bucket_n") <= 1000L)
      .select("bucket", "id", "bucket_n")
    // AFTER: one window over one banded pass
    val w = org.apache.spark.sql.expressions.Window.partitionBy("bucket")
    val after = banded0
      .withColumn("bucket_n", count(lit(1)).over(w))
      .where(col("bucket_n") <= 1000L)
      .select("bucket", "id", "bucket_n")
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted")).trim
      java.nio.file.Files.writeString(outDir.resolve(name), txt + "\n")
      println(s"[explain] wrote $outDir/$name")
    }
    dump("writeSignatures_banded_before.txt", before)
    dump("writeSignatures_banded_after.txt", after)
    spark.stop()
  }
}
