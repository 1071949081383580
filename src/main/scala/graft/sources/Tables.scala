package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the test-data star schema.
  *
  * The `events` table stores `ts` as parquet TIMESTAMP(NANOS), which
  * Spark 4 rejects by default (PARQUET_TYPE_ILLEGAL). We read it under
  * the `nanosAsLong` legacy conf and truncate ns → µs explicitly —
  * integer `div`, so the conversion matches DuckDB's own ns→µs/ms
  * truncation semantics bit-for-bit.
  */
object Tables {

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }
}
