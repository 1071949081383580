package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
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
  * publishes ~64k ≈1 GB `.warc.gz` files per snapshot, so
  * `binaryFiles` gives one task per file and the cluster scales by
  * file count; records inside a file parse in one linear scan with
  * memory bounded by the largest single record, never the file
  * (payloads are sliced straight out of the buffer). Gzip members
  * are handled concatenated (Common Crawl writes one member per
  * record; `GZIPInputStream` walks members natively). The parser is
  * byte-offset-driven off `Content-Length` — bodies may contain
  * anything, including WARC-looking text — and malformed trailing
  * garbage ends the file's iteration instead of throwing, so one
  * corrupt record cannot poison a 1 GB file's task.
  *
  * Output columns: (warc_type, url, warc_date, content_type,
  * http_status, body) — `http_status`/`content_type` from the HTTP
  * head for `application/http` records (status -1 when absent),
  * `body` the decoded payload (HTTP body for response records).
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

  /** Decode possibly-gzipped file bytes. GZIPInputStream consumes
    * CONCATENATED members (the Common Crawl member-per-record
    * layout) in one pass.
    */
  private[graft] def maybeGunzip(bytes: Array[Byte]): Array[Byte] = {
    if (bytes.length < 2 || (bytes(0) & 0xff) != 0x1f || (bytes(1) & 0xff) != 0x8b) return bytes
    val in = new GZIPInputStream(new ByteArrayInputStream(bytes), 64 * 1024)
    val out = new ByteArrayOutputStream(bytes.length * 4)
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  /** Parse one (decompressed) WARC file. Returns complete records in
    * file order; stops quietly at the first malformed boundary.
    */
  private[graft] def parseWarc(bytes: Array[Byte]): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var pos = 0
      private var nextRec: WarcRecord = advance()

      private def headerBlock(start: Int): Option[(Map[String, String], Int)] = {
        val end = bytesIndexOf(bytes, Crlf ++ Crlf, start)
        if (end < 0) return None
        val block = new String(bytes, start, end - start, StandardCharsets.UTF_8)
        val lines = block.split("\r\n")
        if (lines.isEmpty || !lines.head.startsWith("WARC/")) return None
        val hdrs = lines.tail.iterator.flatMap { l =>
          val c = l.indexOf(':')
          if (c <= 0) None
          else Some(l.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT) ->
            l.substring(c + 1).trim)
        }.toMap
        Some((hdrs, end + 4))
      }

      private def advance(): WarcRecord = {
        while (pos < bytes.length) {
          // tolerate inter-record padding/garbage: seek the next version line
          val at = bytesIndexOf(bytes, "WARC/".getBytes(StandardCharsets.US_ASCII), pos)
          if (at < 0) { pos = bytes.length; return null }
          headerBlock(at) match {
            case None => pos = bytes.length; return null
            case Some((hdrs, bodyStart)) =>
              val len = hdrs.get("content-length").flatMap(_.toLongOption).getOrElse(-1L)
              if (len < 0 || bodyStart + len > bytes.length) { pos = bytes.length; return null }
              val bodyEnd = bodyStart + len.toInt
              pos = bodyEnd // the trailing CRLFCRLF is skipped by the next seek
              val warcType = hdrs.getOrElse("warc-type", "")
              val url = hdrs.getOrElse("warc-target-uri", null)
              val date = hdrs.getOrElse("warc-date", null)
              val recCt = hdrs.getOrElse("content-type", "")
              // application/http payloads: split the HTTP head off
              if (recCt.startsWith("application/http")) {
                val headEnd = bytesIndexOf(bytes, Crlf ++ Crlf, bodyStart)
                if (headEnd >= 0 && headEnd + 4 <= bodyEnd) {
                  val head = new String(bytes, bodyStart, headEnd - bodyStart,
                    StandardCharsets.UTF_8)
                  val headLines = head.split("\r\n")
                  val status = headLines.headOption
                    .filter(_.startsWith("HTTP/"))
                    .flatMap(_.split(" ").lift(1)).flatMap(_.toIntOption).getOrElse(-1)
                  val httpCt = headLines.iterator
                    .find(_.toLowerCase(java.util.Locale.ROOT).startsWith("content-type:"))
                    .map(l => l.substring(l.indexOf(':') + 1).trim).getOrElse(recCt)
                  val body = new String(bytes, headEnd + 4, bodyEnd - headEnd - 4,
                    StandardCharsets.UTF_8)
                  return WarcRecord(warcType, url, date, httpCt, status, body)
                }
              }
              val body = new String(bytes, bodyStart, bodyEnd - bodyStart,
                StandardCharsets.UTF_8)
              return WarcRecord(warcType, url, date, recCt, -1, body)
          }
        }
        null
      }

      override def hasNext: Boolean = nextRec != null
      override def next(): WarcRecord = {
        val r = nextRec; nextRec = advance(); r
      }
    }

  /** Read WARC files (plain or `.gz`, per-record or whole-file
    * members) under `path` (glob ok) into a DataFrame — one task per
    * file, the Common Crawl layout's natural parallelism.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext
      .binaryFiles(path)
      .flatMap { case (_, pds) => parseWarc(maybeGunzip(pds.toArray())) }
      .toDF()
  }

  /** STREAMING WARC ingestion — the file-arrival shape a production
    * crawl pipeline lands on: a crawler drops finished `.warc.gz`
    * files into a directory/bucket and this source picks each up
    * exactly once (Spark's `binaryFile` file stream tracks processed
    * files in the checkpoint), parses it with the same kernel as the
    * batch [[read]], and emits one row per record — a stateless
    * projection, so it composes directly with
    * [[graft.streaming.StreamingWebIngest.webIngestStream]] (feed the
    * `response` rows as (id, ts, html, url)).
    *
    * Same scale shape as batch: the file is the unit of work; a
    * 1 GB archive parses in one task with memory bounded by its
    * largest record.
    */
  def readStream(spark: SparkSession, path: String): DataFrame = {
    val parseUdf = org.apache.spark.sql.functions.udf { (bytes: Array[Byte]) =>
      if (bytes == null) Seq.empty[WarcRecord]
      else parseWarc(maybeGunzip(bytes)).toSeq
    }
    import org.apache.spark.sql.functions.{col, explode}
    import org.apache.spark.sql.types._
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
      .select(explode(parseUdf(col("content"))).as("r"))
      .select(col("r.*"))
  }

  /** Serialize records into WARC bytes (testing + fixture tool; one
    * `response` record per row, HTTP head included).
    */
  private[graft] def buildWarc(
      records: Seq[(String, String, String)], // (url, date, htmlBody)
      gzipPerRecord: Boolean,
  ): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach { case (url, date, html) =>
      val httpBytes =
        ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n" + html)
          .getBytes(StandardCharsets.UTF_8)
      val rec = new ByteArrayOutputStream()
      rec.write(
        (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $url\r\n" +
          s"WARC-Date: $date\r\nContent-Type: application/http; msgtype=response\r\n" +
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
}
