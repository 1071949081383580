package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Multimodal (image/audio/video) column handling.
  *
  * Contract: media travel as opaque `binary` columns plus a typed
  * metadata struct; decode / feature-extract / resize / frame-sample
  * run batch-at-a-time inside `mapPartitions` so per-partition decoder
  * initialization (the expensive part with real codecs) is amortized
  * across rows — the Scala analog of `mapInPandas` batching.
  *
  * The actual byte-level decoders are STUBBED with deterministic fakes
  * (this container has no image/audio libraries): `decodeMeta` parses
  * only real magic numbers + a deterministic pseudo-geometry, and
  * `embedMedia` hashes bytes into a fixed-dim vector. The Spark-side
  * plumbing — schemas, batching, null handling, partition sizing — is
  * real and tested; swapping a real decoder in changes only the
  * function bodies marked STUB.
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(
    Seq(
      StructField("format", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
    ),
  )

  /** Decode media headers: REAL parsing for PNG (IHDR), JPEG (SOF
    * scan), GIF (logical screen) and WAV (fmt chunk — width carries
    * sample rate, height carries channel count); unknown payloads get
    * a deterministic pseudo-geometry (the stand-in for formats this
    * container can't decode — swap in a real codec here).
    */
  private[operators] def decodeOne(bytes: Array[Byte]): (String, Int, Int, Long) = {
    if (bytes == null || bytes.isEmpty) return ("empty", 0, 0, 0L)
    def u8(i: Int): Int = bytes(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)

    val n = bytes.length
    if (n >= 24 && u8(0) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') {
      // IHDR is always the first chunk: width/height big-endian at 16/20
      ("png", be32(16), be32(20), n.toLong)
    } else if (n >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // walk segments to the first SOFn (baseline/progressive frame header)
      var i = 2
      var w = 0
      var h = 0
      var done = false
      while (!done && i + 9 < n) {
        if (u8(i) != 0xff) { i += 1 }
        else {
          val marker = u8(i + 1)
          if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) i += 2
          else if ((marker >= 0xc0 && marker <= 0xcf) && marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
            h = be16(i + 5); w = be16(i + 7); done = true
          } else i += 2 + be16(i + 2) // skip segment by declared length
        }
      }
      ("jpeg", w, h, n.toLong)
    } else if (n >= 10 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8') {
      ("gif", le16(6), le16(8), n.toLong)
    } else if (n >= 28 && bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') {
      // fmt chunk normally at offset 12: channels LE16@22, sampleRate LE32@24
      ("wav", le32(24), le16(22), n.toLong)
    } else {
      // STUB geometry for undecodable payloads: deterministic content hash
      var h = 0xcbf29ce484222325L
      bytes.take(64).foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
      ("bin", 64 + (math.abs(h) % 1024).toInt, 64 + (math.abs(h >> 20) % 1024).toInt, n.toLong)
    }
  }

  /** Add a `media_meta` struct decoded from `binCol`. Batch-shaped:
    * one "decoder" per partition, rows streamed through it.
    */
  def withDecodedMeta(df: DataFrame, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+ StructField("media_meta", mediaMetaSchema))
    val binIdx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { rows =>
      // real codecs would init a decoder context here, once per partition
      rows.map { r =>
        val (fmt, w, h, n) = decodeOne(r.get(binIdx) match {
          case b: Array[Byte] => b
          case null           => null
        })
        Row.fromSeq(r.toSeq :+ Row(fmt, w, h, n))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic pseudo-embedding of media bytes (STUB for a real
    * vision/audio encoder): byte-histogram + hash mixing → `dim`
    * floats. Codegen-friendly scalar UDF; the real version would be a
    * batched model call inside mapPartitions.
    */
  def embedMediaUdf(dim: Int = 16) = udf { (bytes: Array[Byte]) =>
    val v = new Array[Float](dim)
    if (bytes != null && bytes.nonEmpty) {
      var i = 0
      while (i < bytes.length) {
        val d = Dedup.mix64(bytes(i).toLong * 31 + i)
        v((d % dim).toInt.abs) += 1f / (1 + (i % 7))
        i += 1
      }
      var ss = 0.0
      v.foreach(x => ss += x * x)
      val nrm = math.sqrt(ss)
      if (nrm > 0) { var j = 0; while (j < dim) { v(j) = (v(j) / nrm).toFloat; j += 1 } }
    }
    v
  }

  /** STUB resize: real impl decodes, scales, re-encodes; the stub
    * truncates/pads deterministically so plumbing (binary in → binary
    * out, same partitioning) is exercised.
    */
  def resizeStubUdf(targetBytes: Int) = udf { (bytes: Array[Byte]) =>
    if (bytes == null) null
    else if (bytes.length >= targetBytes) bytes.take(targetBytes)
    else bytes ++ new Array[Byte](targetBytes - bytes.length)
  }

  /** STUB frame sampler: every `stride`-th chunk of `frameBytes` as a
    * "frame" (real impl: container demux + keyframe select). Output is
    * `array<binary>` — one row per video, frames nested, so downstream
    * `explode` controls fan-out explicitly.
    */
  def frameSampleUdf(frameBytes: Int, stride: Int) = udf { (bytes: Array[Byte]) =>
    if (bytes == null) Array.empty[Array[Byte]]
    else bytes.grouped(frameBytes).zipWithIndex.collect {
      case (chunk, i) if i % stride == 0 => chunk
    }.toArray
  }
}
