package graft

import java.nio.charset.StandardCharsets

import graft.sources.Warc

class WarcSpec extends SparkTestBase {
  import spark.implicits._

  private def rec(url: String, html: String) = (url, "2024-06-01T10:00:00Z", html)

  test("roundtrip: plain, gzip-per-record, and whole-file gzip all parse identically") {
    val recs = Seq(rec("http://a.com/1", "<html>one</html>"), rec("http://a.com/2", "<p>two</p>"))
    val plain = Warc.buildWarc(recs, gzipPerRecord = false)
    val gzRec = Warc.buildWarc(recs, gzipPerRecord = true)
    // whole-file gzip: one member over the full plain bytes
    val whole = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(plain); g.close(); bos.toByteArray
    }
    val expect = recs.map { case (u, _, h) => (u, h) }
    Seq(plain, gzRec, whole).foreach { bytes =>
      val got = Warc.parseWarc(bytes).map(r => (r.url, r.body)).toList
      assert(got == expect, s"roundtrip failed for a variant: $got")
    }
  }

  test("charset: body decoded per the HTTP head's charset= parameter; unknown charset falls back to UTF-8") {
    val latin = "café jalapeño" // é=0xE9, ñ=0xF1 in ISO-8859-1 — invalid as UTF-8
    val pages = Seq(
      Warc.FixturePage("http://c.com/latin1", "2024-06-01T10:00:00Z",
        Seq("Content-Type: text/html; charset=iso-8859-1"),
        ("<p>" + latin + "</p>").getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)),
      Warc.FixturePage("http://c.com/utf8", "2024-06-01T10:00:00Z",
        Seq("Content-Type: text/html; charset=utf-8"),
        ("<p>" + latin + "</p>").getBytes(StandardCharsets.UTF_8)),
      Warc.FixturePage("http://c.com/unknown", "2024-06-01T10:00:00Z",
        Seq("Content-Type: text/html; charset=klingon-8"),
        "<p>plain ascii</p>".getBytes(StandardCharsets.UTF_8)),
    )
    val got = Warc.parseWarc(Warc.buildWarcRaw(pages, gzipPerRecord = false))
      .map(r => (r.url, r.body)).toMap
    assert(got("http://c.com/latin1") == "<p>" + latin + "</p>",
      s"latin1 not decoded per charset: ${got("http://c.com/latin1")}")
    assert(got("http://c.com/utf8") == "<p>" + latin + "</p>")
    assert(got("http://c.com/unknown") == "<p>plain ascii</p>")
  }

  test("chunked transfer coding is decoded (sizes in hex, extensions and trailers ignored); non-chunked untouched") {
    val body = "chunked body with WARC/1.0 inside and 0 digits"
    val wire = Warc.chunkEncode(body.getBytes(StandardCharsets.UTF_8), 7)
    val pages = Seq(
      Warc.FixturePage("http://t.com/chunked", "2024-06-01T10:00:00Z",
        Seq("Content-Type: text/html; charset=utf-8", "Transfer-Encoding: chunked"), wire),
      Warc.FixturePage("http://t.com/plain", "2024-06-01T10:00:00Z",
        Seq("Content-Type: text/html; charset=utf-8"),
        body.getBytes(StandardCharsets.UTF_8)),
    )
    val got = Warc.parseWarc(Warc.buildWarcRaw(pages, gzipPerRecord = false))
      .map(r => (r.url, r.body)).toMap
    assert(got("http://t.com/chunked") == body, s"dechunk failed: ${got("http://t.com/chunked")}")
    assert(got("http://t.com/plain") == body)
    // mislabeled chunked head with a non-chunked body passes through raw
    val mislabeled = Warc.parseWarc(Warc.buildWarcRaw(Seq(
      Warc.FixturePage("http://t.com/mislabeled", "2024-06-01T10:00:00Z",
        Seq("Content-Type: text/html", "Transfer-Encoding: chunked"),
        "zz not hex".getBytes(StandardCharsets.UTF_8))), false)).next()
    assert(mislabeled.body == "zz not hex")
  }

  test("mid-file gzip corruption yields the records decoded so far instead of throwing") {
    val one = Warc.buildWarc(Seq(rec("http://ok.com/1", "<p>fine</p>")), gzipPerRecord = true)
    val corrupt = one ++ one.take(40) // second member truncated mid-header/deflate
    val got = Warc.parseWarc(corrupt).map(_.url).toList
    assert(got == Seq("http://ok.com/1"), s"got=$got")
  }

  test("memory bound is real: 300 MB archive parses in a 64 MB-heap child JVM") {
    val javaBin = sys.props("java.home") + "/bin/java"
    val cp = sys.props("java.class.path")
    val cmd = Seq(javaBin, "-Xmx64m", "-cp", cp, "graft.tools.WarcHeapProbe", "3000", "100000")
    val outBuf = new StringBuilder
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val src = scala.io.Source.fromInputStream(proc.getInputStream)
    try outBuf ++= src.mkString finally src.close()
    val exit = proc.waitFor()
    assert(exit == 0 && outBuf.toString.contains("OK 3000"),
      s"heap-capped parse failed (exit=$exit): ${outBuf.toString.takeRight(2000)}")
  }

  test("http head split: status and content-type extracted, body exact") {
    val r = Warc.parseWarc(Warc.buildWarc(Seq(rec("http://x.com/", "<b>B</b>")), false)).next()
    assert(r.warc_type == "response" && r.http_status == 200)
    assert(r.content_type == "text/html; charset=utf-8")
    assert(r.body == "<b>B</b>")
  }

  test("Content-Length is authoritative: bodies containing WARC/ lines and CRLFCRLF survive verbatim") {
    val tricky = "WARC/1.0\r\nWARC-Type: fake\r\n\r\nnot a record\r\n\r\ntail"
    val recs = Seq(rec("http://t.com/1", tricky), rec("http://t.com/2", "after"))
    val got = Warc.parseWarc(Warc.buildWarc(recs, false)).map(r => (r.url, r.body)).toList
    assert(got == Seq(("http://t.com/1", tricky), ("http://t.com/2", "after")),
      s"body-embedded WARC text corrupted the scan: $got")
  }

  test("malformed trailing garbage ends iteration instead of throwing; empty input yields no records") {
    val good = Warc.buildWarc(Seq(rec("http://g.com/", "ok")), false)
    val garbage = "WARC/1.0\r\nContent-Length: 99999999\r\n\r\ntruncated"
      .getBytes(StandardCharsets.UTF_8)
    val got = Warc.parseWarc(good ++ garbage).toList
    assert(got.map(_.url) == Seq("http://g.com/"), s"got=$got")
    assert(Warc.parseWarc(Array.emptyByteArray).toList.isEmpty)
    assert(Warc.parseWarc("no records here".getBytes(StandardCharsets.UTF_8)).toList.isEmpty)
  }

  test("non-http records carry the raw payload and status -1") {
    val warcinfo = ("WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Type: application/warc-fields\r\n" +
      "Content-Length: 9\r\n\r\nrobots: x\r\n\r\n").getBytes(StandardCharsets.US_ASCII)
    val r = Warc.parseWarc(warcinfo).next()
    assert(r.warc_type == "warcinfo" && r.http_status == -1 && r.body == "robots: x")
  }

  test("streaming read: files picked up on arrival, each exactly once; stream ≡ batch fields") {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-stream")
    java.nio.file.Files.write(dir.resolve("w1.warc"),
      Warc.buildWarc(Seq(rec("http://s.com/1", "<p>first</p>")), false))
    val q = Warc.readStream(spark, dir.toString)
      .writeStream.format("memory").queryName("warc_stream").outputMode("append").start()
    try {
      q.processAllAvailable()
      val first = spark.table("warc_stream")
        .select($"url", $"http_status", $"body").as[(String, Int, String)].collect().toSet
      assert(first == Set(("http://s.com/1", 200, "<p>first</p>")), s"first=$first")
      // a later-arriving gzipped file is picked up incrementally
      java.nio.file.Files.write(dir.resolve("w2.warc.gz"),
        Warc.buildWarc(Seq(rec("http://s.com/2", "<p>second</p>")), true))
      q.processAllAvailable()
      val all = spark.table("warc_stream")
        .select($"url", $"body").as[(String, String)].collect().toList
      assert(all.toSet == Set(
        ("http://s.com/1", "<p>first</p>"), ("http://s.com/2", "<p>second</p>")))
      assert(all.size == 2, s"each file exactly once: $all")
    } finally q.stop()
  }

  test("distributed read: one DataFrame over mixed plain and gzip files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-spec")
    val recsA = Seq(rec("http://f.com/a", "<p>alpha</p>"))
    val recsB = Seq(rec("http://f.com/b", "<p>beta</p>"))
    java.nio.file.Files.write(dir.resolve("a.warc"), Warc.buildWarc(recsA, false))
    java.nio.file.Files.write(dir.resolve("b.warc.gz"), Warc.buildWarc(recsB, true))
    val got = Warc.read(spark, dir.toString + "/*")
      .select($"url", $"body").as[(String, String)].collect().toSet
    assert(got == Set(("http://f.com/a", "<p>alpha</p>"), ("http://f.com/b", "<p>beta</p>")))
  }

  test("WET feeds the pipeline: prepare over readWet equals prepare over the parquet docs") {
    // the switch-from-parquet-to-WET story must be a no-op: same
    // docs through the same pipeline, same training chunks out
    val docs = graft.sources.Tables.load(spark, Sf0001, "documents")
      .where($"doc_id" < 60).select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    val dir = java.nio.file.Files.createTempDirectory("graft-wet-pipe")
    java.nio.file.Files.write(dir.resolve("d.warc.wet.gz"),
      Warc.buildWet(docs.map { case (id, t) =>
        (s"http://wet.example.com/doc/$id", "2024-06-01T10:00:00Z", t)
      }, gzipPerRecord = true))
    val fromWet = Warc.readWet(spark, dir.toString + "/*")
      .select(org.apache.spark.sql.functions
        .regexp_extract($"url", "/doc/(\\d+)$", 1).cast("long").as("doc_id"), $"text")
    val fromParquet = docs.toDF("doc_id", "text")
    def chunksOf(df: org.apache.spark.sql.DataFrame) = graft.operators.CorpusPipeline
      .prepare(df, "doc_id", "text", window = 64, stride = 64)
      .select($"doc_id", $"chunk_idx", $"chunk_text")
      .as[(Long, Long, String)].collect().toSet
    val a = chunksOf(fromWet)
    assert(a.nonEmpty, "pipeline produced no chunks from the WET read")
    assert(a == chunksOf(fromParquet), "WET-sourced pipeline diverged from parquet-sourced")
  }

  test("WET face: conversion records read as (url, date, text); warcinfo filtered; UTF-8 intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wet-spec")
    val pages = Seq(
      ("http://w.com/1", "2024-06-01T10:00:00Z", "extracted text one\nsecond line"),
      ("http://w.com/2", "2024-06-01T10:00:01Z", "κείμενο — emoji 😀 survives"))
    java.nio.file.Files.write(dir.resolve("a.warc.wet.gz"),
      Warc.buildWet(pages.take(1), gzipPerRecord = true))
    java.nio.file.Files.write(dir.resolve("b.warc.wet"),
      Warc.buildWet(pages.drop(1), gzipPerRecord = false))
    val got = Warc.readWet(spark, dir.toString + "/*")
      .as[(String, String, String)].collect().toSet
    assert(got == pages.map(p => (p._1, p._2, p._3)).toSet, got)
    // the warcinfo prelude is present in the container but not the face
    val raw = Warc.read(spark, dir.toString + "/*")
    assert(raw.where($"warc_type" === "warcinfo").count() == 2)
    assert(raw.count() == 4)
  }
}
