package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, ByteArrayOutputStream, IOException, InputStream, PushbackInputStream}
import java.nio.charset.{Charset, StandardCharsets}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** WARC (Web ARChive, ISO 28500) reader — the container Common Crawl
  * and every serious crawler ship: each file is a sequence of records
  * (version line, CRLF-separated named headers, blank line, exactly
  * `Content-Length` payload bytes, blank line), and `response`
  * records wrap a full HTTP response whose body is the HTML the
  * web-ingest pipeline wants.
  *
  * Scale shape: the FILE is the parallelism unit — Common Crawl
  * publishes ~64k ≈1 GB `.warc.gz` files per snapshot, so one task
  * per file scales the cluster by file count. Records parse in ONE
  * forward pass over an `InputStream`: gzip members decompress
  * incrementally through `GZIPInputStream` (which walks Common
  * Crawl's member-per-record concatenation natively), the header
  * block is read line-by-line, and the body is read as exactly
  * `Content-Length` bytes — so task memory is genuinely bounded by
  * one header block plus ONE record body (2 GB single-record cap,
  * the JVM array bound), never by the file. The batch path reads
  * straight from the storage stream (`PortableDataStream.open`), so
  * not even the compressed file is materialized.
  *
  * Fault shape: bodies may contain anything, including WARC-looking
  * text — `Content-Length` is authoritative, so embedded version
  * lines never desynchronize the scan. A malformed boundary,
  * truncated record, over-cap header line, or mid-file gzip
  * corruption (`IOException`/`ZipException`) ends THAT FILE's
  * iteration quietly with the records decoded so far — one corrupt
  * archive cannot fail a batch task, and the streaming face never
  * wedges retrying a poisoned file.
  *
  * HTTP fidelity (`application/http` records): the head is split off
  * at the first CRLFCRLF; `Transfer-Encoding: chunked` payloads are
  * de-chunked (crawlers that store responses verbatim keep the
  * chunking on the wire); the body is decoded per the head's
  * `charset=` parameter (UTF-8 when absent or unknown — the HTML5
  * default); status/content-type come from the status line and
  * `Content-Type` header.
  *
  * Output columns: (warc_type, url, warc_date, content_type,
  * http_status, body) — `http_status` -1 for non-HTTP records.
  */
object Warc {

  final case class WarcRecord(
      warc_type: String,
      url: String,
      warc_date: String,
      content_type: String,
      http_status: Int,
      body: String,
  )

  private val Crlf = "\r\n".getBytes(StandardCharsets.US_ASCII)
  private val CrlfCrlf = Crlf ++ Crlf

  /** Header lines over this are malformed (ends the file quietly) —
    * the cap is what bounds memory while skipping inter-record
    * garbage that contains newlines but no version line.
    */
  private val MaxHeaderLineBytes = 1 << 20
  private val MaxHeaderCount = 1024

  /** Index of `pattern` in `hay` starting at `from`, or -1. Named
    * distinctly from `Iterator.indexOf`: inside the parse iterator a
    * bare 3-arg `indexOf` call AUTO-TUPLES into the INHERITED
    * `Iterator.indexOf(elem)` (consuming the iterator, returning -1)
    * instead of resolving to the outer object's helper.
    */
  private def bytesIndexOf(hay: Array[Byte], pattern: Array[Byte], from: Int): Int = {
    var i = from
    val last = hay.length - pattern.length
    while (i <= last) {
      var j = 0
      while (j < pattern.length && hay(i + j) == pattern(j)) j += 1
      if (j == pattern.length) return i
      i += 1
    }
    -1
  }

  private final class MalformedWarc(msg: String) extends IOException(msg)

  /** Sniff the 2-byte gzip magic and wrap accordingly — decompression
    * is INCREMENTAL (64 KB inflater buffer); the raw stream is never
    * drained into memory. `GZIPInputStream` consumes CONCATENATED
    * members, the Common Crawl member-per-record layout, in one pass.
    */
  private def decodeLayer(raw: InputStream): InputStream = {
    val pb = new PushbackInputStream(raw, 2)
    val b0 = pb.read()
    if (b0 < 0) return pb
    val b1 = pb.read()
    if (b1 >= 0) pb.unread(b1)
    pb.unread(b0)
    // the extra buffer over GZIP keeps readLine's byte-at-a-time
    // header scan off the inflater (bodies bulk-read either way)
    if (b0 == 0x1f && b1 == 0x8b)
      new BufferedInputStream(new GZIPInputStream(pb, 64 * 1024), 64 * 1024)
    else new BufferedInputStream(pb, 64 * 1024)
  }

  /** One LF-terminated line (CR stripped) as ISO-8859-1, or null at
    * EOF. Throws MalformedWarc over the line cap.
    */
  private def readLine(in: InputStream): String = {
    var b = in.read()
    if (b < 0) return null
    val buf = new ByteArrayOutputStream(128)
    while (b >= 0 && b != '\n') {
      buf.write(b)
      if (buf.size > MaxHeaderLineBytes) throw new MalformedWarc("header line over cap")
      b = in.read()
    }
    val arr = buf.toByteArray
    val len = if (arr.nonEmpty && arr(arr.length - 1) == '\r') arr.length - 1 else arr.length
    new String(arr, 0, len, StandardCharsets.ISO_8859_1)
  }

  /** Charset named by a Content-Type's `charset=` parameter; UTF-8
    * when absent, unquotable, or unknown to the JVM.
    */
  private[graft] def charsetOf(contentType: String): Charset = {
    if (contentType == null) return StandardCharsets.UTF_8
    "(?i)charset=\"?([^\";\\s]+)".r
      .findFirstMatchIn(contentType)
      .flatMap { m =>
        try Some(Charset.forName(m.group(1)))
        catch { case _: Exception => None }
      }
      .getOrElse(StandardCharsets.UTF_8)
  }

  /** Decode a `Transfer-Encoding: chunked` payload (hex size line,
    * chunk bytes, CRLF, …, 0-size terminator; extensions and trailers
    * ignored). Malformed chunking returns the bytes decoded so far
    * plus nothing — mirroring the parser's stop-quietly rule — unless
    * nothing decoded, in which case the raw payload passes through
    * (a mislabeled head must not eat the body).
    */
  private[graft] def dechunk(payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(payload.length)
    var pos = 0
    var ok = false
    var done = false
    while (!done) {
      // size line ends at CRLF (tolerate bare LF)
      var eol = pos
      while (eol < payload.length && payload(eol) != '\n') eol += 1
      if (eol >= payload.length) { done = true }
      else {
        val lineEnd = if (eol > pos && payload(eol - 1) == '\r') eol - 1 else eol
        val sizeStr = new String(payload, pos, lineEnd - pos, StandardCharsets.US_ASCII)
          .takeWhile(c => c != ';').trim
        val size =
          try java.lang.Long.parseLong(sizeStr, 16)
          catch { case _: NumberFormatException => -1L }
        if (size < 0 || eol + 1 + size > payload.length) { done = true }
        else if (size == 0L) { ok = true; done = true } // terminator; trailers ignored
        else {
          out.write(payload, eol + 1, size.toInt)
          ok = true
          pos = eol + 1 + size.toInt
          // skip the chunk-data CRLF
          if (pos < payload.length && payload(pos) == '\r') pos += 1
          if (pos < payload.length && payload(pos) == '\n') pos += 1
        }
      }
    }
    if (ok) out.toByteArray else payload
  }

  /** Decode one record's payload into a [[WarcRecord]] given its WARC
    * headers — HTTP head split, de-chunking, and charset decoding all
    * happen here, on ONE record's bytes.
    */
  private def decodeRecord(hdrs: Map[String, String], payload: Array[Byte]): WarcRecord = {
    val warcType = hdrs.getOrElse("warc-type", "")
    val url = hdrs.getOrElse("warc-target-uri", null)
    val date = hdrs.getOrElse("warc-date", null)
    val recCt = hdrs.getOrElse("content-type", "")
    if (recCt.startsWith("application/http")) {
      val headEnd = bytesIndexOf(payload, CrlfCrlf, 0)
      if (headEnd >= 0) {
        val headLines = new String(payload, 0, headEnd, StandardCharsets.ISO_8859_1)
          .split("\r\n")
        val status = headLines.headOption
          .filter(_.startsWith("HTTP/"))
          .flatMap(_.split(" ").lift(1)).flatMap(_.toIntOption).getOrElse(-1)
        def headerVal(name: String): Option[String] = headLines.iterator
          .find(_.toLowerCase(java.util.Locale.ROOT).startsWith(name + ":"))
          .map(l => l.substring(l.indexOf(':') + 1).trim)
        val httpCt = headerVal("content-type").getOrElse(recCt)
        val chunked = headerVal("transfer-encoding")
          .exists(_.toLowerCase(java.util.Locale.ROOT).contains("chunked"))
        var bodyBytes = java.util.Arrays.copyOfRange(payload, headEnd + 4, payload.length)
        if (chunked) bodyBytes = dechunk(bodyBytes)
        return WarcRecord(warcType, url, date, httpCt, status,
          new String(bodyBytes, charsetOf(httpCt)))
      }
    }
    WarcRecord(warcType, url, date, recCt, -1,
      new String(payload, StandardCharsets.UTF_8))
  }

  /** Parse a WARC stream (plain or gzipped — sniffed) record by
    * record. Memory: one header block + one `Content-Length` body at
    * a time. Any `IOException` (gzip corruption, truncation,
    * over-cap lines) ends the iteration with the records decoded so
    * far. The stream is closed at end-of-iteration or on error.
    */
  private[graft] def parseStream(raw: InputStream): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var in: InputStream = _
      private var nextRec: WarcRecord =
        try { in = decodeLayer(raw); advance() }
        catch { case _: IOException => closeQuietly(); null }

      private def closeQuietly(): Unit = {
        try { if (in != null) in.close() else raw.close() }
        catch { case _: IOException => () }
      }

      private def advance(): WarcRecord = {
        try {
          // seek the next version line, tolerating inter-record
          // padding and the record-terminating blank lines
          var line = readLine(in)
          while (line != null && !line.startsWith("WARC/")) line = readLine(in)
          if (line == null) { closeQuietly(); return null }
          var hdrs = Map.empty[String, String]
          var h = readLine(in)
          var nHdrs = 0
          while (h != null && h.nonEmpty) {
            val c = h.indexOf(':')
            if (c > 0) {
              hdrs += (h.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT) ->
                h.substring(c + 1).trim)
            }
            nHdrs += 1
            if (nHdrs > MaxHeaderCount) throw new MalformedWarc("header count over cap")
            h = readLine(in)
          }
          if (h == null) { closeQuietly(); return null } // EOF mid-headers
          val len = hdrs.get("content-length").flatMap(_.toLongOption).getOrElse(-1L)
          // single-record cap: a body must fit one JVM array
          if (len < 0 || len > Int.MaxValue - 16) { closeQuietly(); return null }
          val payload = in.readNBytes(len.toInt)
          if (payload.length < len) { closeQuietly(); return null } // truncated
          decodeRecord(hdrs, payload)
        } catch {
          case _: IOException => closeQuietly(); null
        }
      }

      override def hasNext: Boolean = nextRec != null
      override def next(): WarcRecord = {
        val r = nextRec; nextRec = advance(); r
      }
    }

  /** Byte-array convenience over [[parseStream]] (tests, small
    * fixtures) — same sniffing and bounds; the INPUT is whatever the
    * caller already holds.
    */
  private[graft] def parseWarc(bytes: Array[Byte]): Iterator[WarcRecord] =
    parseStream(new ByteArrayInputStream(bytes))

  /** Read WARC files (plain or `.gz`, per-record or whole-file
    * members) under `path` (glob ok) into a DataFrame — one task per
    * file, the Common Crawl layout's natural parallelism, parsed
    * straight off the storage stream: neither the compressed file nor
    * its decompressed form is ever whole in memory.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext
      .binaryFiles(path)
      .flatMap { case (_, pds) =>
        val in = pds.open()
        // parseStream closes the stream at EOF or on error, but an
        // iterator ABANDONED early (limit/take/failed downstream stage
        // stops pulling) would otherwise hold its storage stream/FD
        // until task GC — across a 64k-file crawl glob that exhausts
        // executor descriptors. The task-completion hook closes
        // whatever is still open; double-close is a no-op.
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            try in.close() catch { case _: Exception => () }
          })
        parseStream(in)
      }
      .toDF()
  }

  /** Common Crawl WET (extracted-text) face: WET files are ordinary
    * WARC containers whose `conversion` records carry each page's
    * extracted plain text (`Content-Type: text/plain`, no HTTP head) —
    * the layout pipelines start from when they skip HTML extraction.
    * Same kernel, parallelism, and memory bounds as [[read]] (the
    * non-HTTP record path decodes the block as UTF-8, the WET
    * contract); `warcinfo` and any interleaved non-conversion records
    * are filtered out. Output: (url, warc_date, text).
    */
  def readWet(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    read(spark, path)
      .where(col("warc_type") === "conversion")
      .select(col("url"), col("warc_date"), col("body").as("text"))
  }

  /** STREAMING WARC ingestion — the file-arrival shape a production
    * crawl pipeline lands on: a crawler drops finished `.warc.gz`
    * files into a directory/bucket and this source picks each up
    * exactly once (Spark's `binaryFile` file stream tracks processed
    * files in the checkpoint), parses it with the same kernel as the
    * batch [[read]], and emits records one at a time through a typed
    * `flatMap` iterator — a stateless projection, so it composes
    * directly with [[graft.streaming.StreamingWebIngest
    * .webIngestStream]] (feed the `response` rows as (id, ts, html,
    * url)).
    *
    * Memory: the `binaryFile` source materializes each file's
    * COMPRESSED bytes as the `content` column (that is the source's
    * contract); decompression and parsing on top of it are
    * incremental, so the bound per in-flight file is its compressed
    * size + one decoded record — not the ~4-5× inflated archive, and
    * never all records at once.
    */
  def readStream(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    import spark.implicits._
    // binaryFile's fixed schema — streaming sources require it stated
    val binSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    spark.readStream
      .format("binaryFile")
      .schema(binSchema)
      .load(path)
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap { bytes =>
        if (bytes == null) Iterator.empty[WarcRecord]
        else parseStream(new ByteArrayInputStream(bytes))
      }
      .toDF()
  }

  /** A raw fixture page: on-the-wire HTTP head lines (after the
    * status line) + body BYTES, so tests can plant charsets and
    * chunked transfer coding exactly as a crawler would capture them.
    */
  private[graft] final case class FixturePage(
      url: String,
      date: String,
      headLines: Seq[String],   // e.g. "Content-Type: text/html; charset=iso-8859-1"
      body: Array[Byte],        // raw wire bytes (chunk-encoded if the head says so)
  )

  /** Chunk-encode a payload for `Transfer-Encoding: chunked` fixtures
    * (hex size line + chunk + CRLF, 0-terminator).
    */
  private[graft] def chunkEncode(payload: Array[Byte], chunkSize: Int): Array[Byte] = {
    require(chunkSize > 0, "chunkSize must be positive")
    val out = new ByteArrayOutputStream(payload.length + 64)
    var pos = 0
    while (pos < payload.length) {
      val n = math.min(chunkSize, payload.length - pos)
      out.write(s"${n.toHexString}\r\n".getBytes(StandardCharsets.US_ASCII))
      out.write(payload, pos, n)
      out.write(Crlf)
      pos += n
    }
    out.write("0\r\n\r\n".getBytes(StandardCharsets.US_ASCII))
    out.toByteArray
  }

  /** Serialize (url, date, text) triples into WET bytes — a `warcinfo`
    * prelude followed by one `conversion` record per page, the Common
    * Crawl WET layout (testing + fixture tool).
    */
  private[graft] def buildWet(
      pages: Seq[(String, String, String)],
      gzipPerRecord: Boolean,
  ): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def writeRec(rec: Array[Byte]): Unit =
      if (gzipPerRecord) {
        val gz = new ByteArrayOutputStream()
        val g = new GZIPOutputStream(gz)
        g.write(rec); g.close()
        out.write(gz.toByteArray)
      } else out.write(rec)
    val info = "software: graft-test\r\n".getBytes(StandardCharsets.UTF_8)
    writeRec(
      (s"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Type: application/warc-fields\r\n" +
        s"Content-Length: ${info.length}\r\n\r\n").getBytes(StandardCharsets.US_ASCII) ++
        info ++ Crlf ++ Crlf)
    pages.foreach { case (url, date, text) =>
      val body = text.getBytes(StandardCharsets.UTF_8)
      // ISO-8859-1, not US_ASCII: the parser's readLine decodes header
      // lines as latin-1, so latin-1 URLs roundtrip while US_ASCII
      // would silently mangle them to '?'; URLs beyond latin-1 are
      // outside this fixture tool's scope (percent-encode them)
      writeRec(
        (s"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: $url\r\n" +
          s"WARC-Date: $date\r\nContent-Type: text/plain\r\n" +
          s"Content-Length: ${body.length}\r\n\r\n")
          .getBytes(StandardCharsets.ISO_8859_1) ++
          body ++ Crlf ++ Crlf)
    }
    out.toByteArray
  }

  /** Serialize raw fixture pages into WARC bytes (testing + fixture
    * tool; one `response` record per page, HTTP head included).
    */
  private[graft] def buildWarcRaw(
      pages: Seq[FixturePage],
      gzipPerRecord: Boolean,
  ): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    pages.foreach { p =>
      val head = ("HTTP/1.1 200 OK" +: p.headLines).mkString("", "\r\n", "\r\n\r\n")
      val httpBytes = head.getBytes(StandardCharsets.ISO_8859_1) ++ p.body
      val rec = new ByteArrayOutputStream()
      rec.write(
        (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: ${p.url}\r\n" +
          s"WARC-Date: ${p.date}\r\nContent-Type: application/http; msgtype=response\r\n" +
          s"Content-Length: ${httpBytes.length}\r\n\r\n").getBytes(StandardCharsets.US_ASCII))
      rec.write(httpBytes)
      rec.write(Crlf); rec.write(Crlf)
      if (gzipPerRecord) {
        val gz = new ByteArrayOutputStream()
        val g = new GZIPOutputStream(gz)
        g.write(rec.toByteArray); g.close()
        out.write(gz.toByteArray)
      } else out.write(rec.toByteArray)
    }
    out.toByteArray
  }

  /** Serialize UTF-8 HTML pages into WARC bytes — the common-case
    * fixture builder (one `response` record per row).
    */
  private[graft] def buildWarc(
      records: Seq[(String, String, String)], // (url, date, htmlBody)
      gzipPerRecord: Boolean,
  ): Array[Byte] =
    buildWarcRaw(
      records.map { case (url, date, html) =>
        FixturePage(url, date, Seq("Content-Type: text/html; charset=utf-8"),
          html.getBytes(StandardCharsets.UTF_8))
      },
      gzipPerRecord)
}
