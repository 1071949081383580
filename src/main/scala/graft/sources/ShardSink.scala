package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode}

/** Deterministic training-shard sink — the write side a training job
  * consumes. The packed layout ([[graft.operators.Packing]], q54)
  * assigns every chunk a training-sequence id (`pack_first`); shards
  * are contiguous ranges of `packsPerShard` packs, so a data loader
  * can map shard → sequence range without reading anything else.
  *
  * Write shape: one shuffle keyed by shard id (each shard lands in
  * exactly one task → exactly one file per shard directory), rows
  * sorted by (pack, id) within the file so shard bytes are a pure
  * function of the layout — rerunning the same layout yields the
  * same manifest checksums. The manifest (one row per shard: row
  * count, token count, pack range, order-insensitive content
  * checksum) is written as a single JSON file next to the shards;
  * checksums use exact integer sums of a 60-bit md5 prefix per row,
  * so they are reproducible across partitionings and engines.
  *
  * 100 TB shape: the shard shuffle is the only exchange and its key
  * cardinality (#shards) is chosen by the caller via
  * `packsPerShard`; the manifest aggregation reuses the same keys
  * (map-side partial agg) and collects only #shards rows.
  */
object ShardSink {

  /** Write `layout` as pack-range shards under `outDir` and a
    * `_manifest.json`; returns the manifest DataFrame
    * (shard, n_rows, n_tokens, pack_lo, pack_hi, checksum).
    */
  def writeShards(
      layout: DataFrame,
      idCol: String,
      tokenCol: String,
      packCol: String,
      outDir: String,
      packsPerShard: Int,
  ): DataFrame = {
    require(packsPerShard > 0, "packsPerShard must be positive")
    val spark = layout.sparkSession
    val sharded = layout
      .withColumn("shard", floor(col(packCol) / packsPerShard.toLong).cast("long"))
      .persist()
    sharded
      .repartition(col("shard"))
      .sortWithinPartitions(col(packCol), col(idCol))
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .parquet(outDir)
    val manifest = sharded
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col(tokenCol).cast("long")).as("n_tokens"),
        min(col(packCol)).cast("long").as("pack_lo"),
        max(col(packCol)).cast("long").as("pack_hi"),
        // order-insensitive exact integer checksum: 60-bit md5 prefix
        // per row, summed — reproducible across partitionings
        sum(conv(substring(md5(concat_ws("|", col(idCol), col(packCol))), 1, 15), 16, 10)
          .cast("decimal(38,0)")).as("checksum"),
      )
      .orderBy("shard")
    // collect ONCE (#shards rows — driver-safe), then hand back a
    // LOCAL frame: returning the lazy plan after the unpersist below
    // would re-run the whole upstream layout on every downstream
    // action
    val collected = manifest.collect()
    sharded.unpersist(blocking = false)
    val local = spark.createDataFrame(
      java.util.Arrays.asList(collected: _*), manifest.schema)
    val rows = local.toJSON.collect()
    val path = new org.apache.hadoop.fs.Path(outDir, "_manifest.json")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write((rows.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    local
  }

  /** Read shards back (the loader face): `shards` = specific shard
    * ids, or all when empty. Partition pruning keeps unread shards
    * untouched — the scan lists only the requested directories.
    */
  def readShards(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      shards: Seq[Long] = Nil,
  ): DataFrame = {
    val df = spark.read.parquet(dir)
    if (shards.isEmpty) df else df.where(col("shard").isInCollection(shards))
  }
}
