package graft.tools

import java.io.{ByteArrayInputStream, InputStream, SequenceInputStream}

import graft.sources.Warc

/** Proof harness for the WARC reader's memory bound: parse a
  * synthetic multi-hundred-MB archive under a DELIBERATELY tiny heap
  * (WarcSpec launches this main in a `java -Xmx64m` child). The
  * archive is generated lazily — a `SequenceInputStream` over one
  * gzip member per record — so neither the producer nor (the claim
  * under test) the parser ever holds more than one record; if the
  * parser buffered the file or all records, a 300 MB archive in a
  * 64 MB heap would OOM instead of printing OK.
  *
  * No SparkSession: this exercises the parse kernel itself, the same
  * code `read`/`readStream` run per task.
  */
object WarcHeapProbe {

  /** One deterministic ~bodyBytes record as its own gzip member. */
  private def recordBytes(i: Int, bodyBytes: Int): Array[Byte] = {
    val filler = new String(Array.fill(bodyBytes)(('a' + i % 26).toChar))
    Warc.buildWarc(
      Seq((s"http://probe.example.com/doc/$i", "2024-06-01T10:00:00Z",
        s"<html><body><p>rec $i marker</p><p>$filler</p></body></html>")),
      gzipPerRecord = true)
  }

  def main(args: Array[String]): Unit = {
    val nRecords = args.headOption.map(_.toInt).getOrElse(3000)
    val bodyBytes = args.lift(1).map(_.toInt).getOrElse(100000)
    val members = new java.util.Enumeration[InputStream] {
      private var i = 0
      override def hasMoreElements: Boolean = i < nRecords
      override def nextElement(): InputStream = {
        val s = new ByteArrayInputStream(recordBytes(i, bodyBytes)); i += 1; s
      }
    }
    val it = Warc.parseStream(new SequenceInputStream(members))
    var n = 0L
    var firstOk = false
    var lastOk = false
    it.foreach { r =>
      if (n == 0) firstOk = r.url.endsWith("/doc/0") && r.body.contains("rec 0 marker")
      lastOk = r.url.endsWith(s"/doc/${nRecords - 1}") &&
        r.body.contains(s"rec ${nRecords - 1} marker") && r.http_status == 200
      n += 1
    }
    if (n == nRecords && firstOk && lastOk) {
      println(s"OK $n")
    } else {
      println(s"FAIL n=$n firstOk=$firstOk lastOk=$lastOk")
      sys.exit(1)
    }
  }
}
