package graft

import org.apache.spark.sql.functions._

import graft.sources.ShardSink

class ShardSinkSpec extends SparkTestBase {
  import spark.implicits._

  private def layout() = (0L until 100L)
    .map(i => (s"c$i", 10L + i % 7, i / 3)) // (chunk_id, n_tokens, pack)
    .toDF("chunk_id", "n_tokens", "pack")
    .repartition(5)

  test("writeShards: shard ranges, manifest totals, one file per shard, pruned read") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    val manifest = ShardSink
      .writeShards(layout(), "chunk_id", "n_tokens", "pack", dir, packsPerShard = 10)
      .collect()
    // packs 0..33 → shards 0..3
    assert(manifest.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(manifest.map(_.getLong(1)).sum == 100L, "manifest row counts cover every row")
    val wantTokens = (0L until 100L).map(i => 10L + i % 7).sum
    assert(manifest.map(_.getLong(2)).sum == wantTokens, "token totals exact")
    manifest.foreach { r =>
      val (shard, lo, hi) = (r.getLong(0), r.getLong(3), r.getLong(4))
      assert(lo >= shard * 10 && hi < (shard + 1) * 10, s"shard $shard pack range [$lo,$hi]")
    }
    // exactly one data file per shard directory (single-task shards)
    val shardDirs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("shard="))
    assert(shardDirs.length == 4)
    shardDirs.foreach { d =>
      assert(d.listFiles().count(_.getName.endsWith(".parquet")) == 1, s"${d.getName}")
    }
    // manifest JSON on disk mirrors the returned frame (read as plain
    // lines — the underscore name is deliberate so parquet scans of
    // the shard dir skip it)
    val lines = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get(dir, "_manifest.json"))
    val onDisk = spark.read.json(spark.createDataset(lines.toArray(Array.empty[String])))
      .orderBy("shard").collect()
    assert(onDisk.length == 4)
    // loader face: full read restores every row; pruned read only asks
    // for the requested shard
    val back = ShardSink.readShards(spark, dir)
    assert(back.count() == 100L)
    val one = ShardSink.readShards(spark, dir, Seq(2L))
    assert(one.select("pack").as[Long].collect().forall(p => p >= 20 && p < 30))
    assert(one.count() == manifest.find(_.getLong(0) == 2L).get.getLong(1))
  }

  test("jsonl round trip: gzip compressed, schema-pinned read, content preserved") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString + "/docs"
    val docs = Seq(
      (1L, "plain prose", "en"),
      (2L, "quotes \" and \\ backslashes\nsurvive", "de"),
    ).toDF("doc_id", "text", "lang")
    graft.sources.Tables.writeJsonl(docs.repartition(1), dir, Some("gzip"))
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".json.gz")), files.mkString(","))
    val back = graft.sources.Tables
      .readJsonl(spark, dir, Some(docs.schema))
      .orderBy("doc_id")
      .collect()
    assert(back.length == 2)
    assert(back(1).getString(1) == "quotes \" and \\ backslashes\nsurvive")
    assert(back(0).getString(2) == "en")
  }

  test("writeShards is deterministic: same layout → same checksums, any partitioning") {
    val d1 = java.nio.file.Files.createTempDirectory("shards1").toString
    val d2 = java.nio.file.Files.createTempDirectory("shards2").toString
    val m1 = ShardSink.writeShards(layout(), "chunk_id", "n_tokens", "pack", d1, 10)
      .select("shard", "checksum").as[(Long, java.math.BigDecimal)].collect().toMap
    val m2 = ShardSink.writeShards(layout().repartition(13), "chunk_id", "n_tokens", "pack", d2, 10)
      .select("shard", "checksum").as[(Long, java.math.BigDecimal)].collect().toMap
    assert(m1.keySet == m2.keySet)
    m1.foreach { case (s, c) => assert(c.compareTo(m2(s)) == 0, s"shard $s checksum drift") }
  }
}
