package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the test-data star schema.
  *
  * The `events` table's `ts` physical type has varied across data
  * generations, so the loader normalizes every layout to one logical
  * type, TIMESTAMP (µs, UTC session):
  *   - parquet TIMESTAMP(NANOS), which Spark 4 rejects by default
  *     (PARQUET_TYPE_ILLEGAL): read under the `nanosAsLong` legacy
  *     conf and truncate ns → µs explicitly — integer `div`, so the
  *     conversion matches DuckDB's ns→µs truncation bit-for-bit;
  *   - parquet TIMESTAMP(µs, isAdjustedToUTC=false), which Spark 4
  *     infers as TIMESTAMP_NTZ: cast to TIMESTAMP — under the UTC
  *     session timezone every entry point sets, the wall-clock is
  *     reinterpreted 1:1, the same micros DuckDB sees in the naive
  *     value (`unix_millis`/`unix_micros` reject NTZ inputs, so the
  *     cast happens here once, not at every call site).
  */
object Tables {

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** JSONL corpus reader — the LLM-pipeline interchange format (one
    * JSON document per line, optionally .gz/.zst per Hadoop codecs;
    * compressed files are NOT splittable, so shard the files
    * themselves at scale). An explicit schema skips Spark's
    * whole-file inference scan — always pass one in production; the
    * schemaless overload is for exploration.
    */
  def readJsonl(
      spark: SparkSession,
      path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None,
  ): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  /** JSONL corpus writer (one doc per line) — `compression` e.g.
    * "gzip"; shard count = the frame's partitioning, so
    * `repartition(n)` first to control file sizes.
    */
  def writeJsonl(df: DataFrame, path: String, compression: Option[String] = None): Unit = {
    val w = df.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
    compression.fold(w)(c => w.option("compression", c)).json(path)
  }
}
