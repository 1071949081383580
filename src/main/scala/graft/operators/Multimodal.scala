package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.DataFrame

/** Multimodal (image/audio/video) column handling.
  *
  * Contract: media travel as opaque `binary` columns plus a typed
  * metadata struct; per-row transforms are scalar UDFs so scans stay
  * columnar (Tungsten + column pruning), and anything needing an
  * expensive per-partition decoder context would drop to
  * `mapPartitions` — none of the current decoders do (javax.imageio
  * readers are cheap to obtain).
  *
  * Decode reality: PNG/JPEG/GIF/BMP get REAL pixel-level decode via
  * the JDK's built-in `javax.imageio` (no external codec needed) —
  * `embedMediaUdf` and `imageResizeUdf` operate on actual pixels.
  * Header metadata additionally parses WAV fmt chunks and AVI main
  * headers. VIDEO is real for AVI, MP4, and Matroska/WebM:
  * [[aviFrames]] demuxes the RIFF chunk tree, [[mp4Frames]]
  * reconstructs sample byte ranges from the ISO BMFF sample tables
  * (stsz/stsc/stco), and [[mkvFrames]] walks the EBML element tree
  * to the video track's blocks; MJPEG frame payloads decode through
  * the same ImageIO path as stills (end-to-end pixel tests in
  * TextAnalysisSpec). Unrecognized containers fall back to a
  * labelled deterministic byte-chunk STUB so the `array<binary>` +
  * explode plumbing still exercises.
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
      // scan RIFF chunks for 'fmt ' like the AVI branch scans for
      // avih — DAW/broadcast WAVs legally put JUNK/LIST/bext chunks
      // first, and fixed offsets 22/24 would report their padding
      // bytes as geometry. fmt data: channels LE16@+2, rate LE32@+4
      var i = 12
      var sr = 0
      var ch = 0
      var found = false
      while (!found && i + 8 <= n) {
        val sz = le32(i + 4)
        if (bytes(i) == 'f' && bytes(i + 1) == 'm' && bytes(i + 2) == 't' &&
          bytes(i + 3) == ' ' && i + 16 <= n) {
          ch = le16(i + 10); sr = le32(i + 12); found = true
        } else if (sz < 0 || sz > n) i = n // corrupt size: stop
        else i += 8 + sz + (sz & 1) // chunks are word-aligned
      }
      ("wav", sr, ch, n.toLong)
    } else if (n >= 72 && bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I' && bytes(11) == ' ') {
      // main header: find the avih chunk near the top (usually at 24);
      // its data carries dwWidth@32, dwHeight@36
      var i = 12
      var w = 0
      var h = 0
      var found = false
      while (!found && i + 48 <= math.min(n, 512)) {
        if (bytes(i) == 'a' && bytes(i + 1) == 'v' && bytes(i + 2) == 'i' && bytes(i + 3) == 'h') {
          w = le32(i + 8 + 32)
          h = le32(i + 8 + 36)
          found = true
        } else i += 1
      }
      ("avi", w, h, n.toLong)
    } else if (n >= 16 && bytes(4) == 'f' && bytes(5) == 't' && bytes(6) == 'y' &&
      bytes(7) == 'p') {
      // ISO BMFF: geometry lives deep in the trak headers; report the
      // container + first demuxed frame's JPEG geometry when present.
      // maxFrames = 1 stops the demux at the first sample — metadata
      // must not materialize a byte copy of every frame in the file
      val wh = mp4Frames(bytes, maxFrames = 1)
        .flatMap(_.headOption)
        .map(decodeOne)
        .filter(_._1 == "jpeg")
        .map(m => (m._2, m._3))
        .getOrElse((0, 0))
      ("mp4", wh._1, wh._2, n.toLong)
    } else if (n >= 16 && u8(0) == 0x1a && u8(1) == 0x45 && u8(2) == 0xdf && u8(3) == 0xa3) {
      val wh = mkvFrames(bytes, maxFrames = 1)
        .flatMap(_.headOption)
        .map(decodeOne)
        .filter(_._1 == "jpeg")
        .map(m => (m._2, m._3))
        .getOrElse((0, 0))
      ("mkv", wh._1, wh._2, n.toLong)
    } else {
      // STUB geometry for undecodable payloads: deterministic content hash
      var h = 0xcbf29ce484222325L
      bytes.take(64).foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
      ("bin", 64 + (math.abs(h) % 1024).toInt, 64 + (math.abs(h >> 20) % 1024).toInt, n.toLong)
    }
  }

  /** Typed metadata row for `media_meta` (field names match
    * [[mediaMetaSchema]]).
    */
  final case class MediaMeta(format: String, width: Int, height: Int, n_bytes: Long)

  /** Add a `media_meta` struct decoded from `binCol`. A
    * struct-returning scalar UDF — the scan stays columnar (no RDD
    * boundary, column pruning and whole-stage codegen intact); the
    * byte-parse needs no per-partition decoder context, so
    * mapPartitions batching would buy nothing.
    */
  def withDecodedMeta(df: DataFrame, binCol: String): DataFrame = {
    val metaUdf = udf { (bytes: Array[Byte]) =>
      val (fmt, w, h, n) = decodeOne(bytes)
      MediaMeta(fmt, w, h, n)
    }
    df.withColumn("media_meta", metaUdf(col(binCol)))
  }

  /** REAL pixel decode via the JDK's javax.imageio (PNG, JPEG, GIF,
    * BMP): grayscale (BT.601 luma) pixels in [0,1], row-major, plus
    * dims. None for undecodable payloads. A cheap magic-number check
    * runs first so non-image bytes never pay the ImageIO reader
    * lookup.
    */
  private[graft] def decodePixels(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    if (bytes == null || bytes.length < 4) return None
    val magicOk =
      ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P') || // png
        ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) || // jpeg
        (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F') || // gif
        (bytes(0) == 'B' && bytes(1) == 'M') // bmp
    if (!magicOk) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val px = new Array[Float](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            px(y * w + x) = (0.299f * r + 0.587f * g + 0.114f * b) / 255f
            x += 1
          }
          y += 1
        }
        Some((w, h, px))
      }
    } catch { case _: Exception => None }
  }

  /** Media embedding: for ImageIO-decodable images this is a REAL
    * pixel-content feature — an L2-normalized `dim`-bin luminance
    * histogram (deterministic, content-sensitive: recolored or
    * re-exposed images land elsewhere). Undecodable payloads (audio
    * beyond headers, opaque blobs) fall back to the deterministic
    * byte-histogram hash — the labelled stand-in for a learned
    * encoder. Scalar UDF either way: shuffle-free, scan-scaled.
    */
  def embedMediaUdf(dim: Int = 16) = udf { (bytes: Array[Byte]) =>
    decodePixels(bytes) match {
      case Some((_, _, px)) =>
        val v = new Array[Float](dim)
        var i = 0
        while (i < px.length) {
          val b = math.min(dim - 1, (px(i) * dim).toInt)
          v(b) += 1f
          i += 1
        }
        l2NormalizeInPlace(v)
        v
      case None =>
        val v = new Array[Float](dim)
        if (bytes != null && bytes.nonEmpty) {
          var i = 0
          while (i < bytes.length) {
            val d = Dedup.mix64(bytes(i).toLong * 31 + i)
            v((d % dim).toInt.abs) += 1f / (1 + (i % 7))
            i += 1
          }
          l2NormalizeInPlace(v)
        }
        v
    }
  }

  /** 64-bit perceptual dHash: decode → area-average to a 9×8
    * grayscale grid → one bit per adjacent-pixel comparison (left
    * brighter than right). Survives re-encoding, resizing, and mild
    * recompression — the standard cheap image near-dup signal. None
    * for undecodable payloads.
    */
  private[graft] def dhash64(bytes: Array[Byte]): Option[Long] =
    decodePixels(bytes).map { case (w, h, px) =>
      val gw = 9
      val gh = 8
      val grid = new Array[Double](gw * gh)
      var gy = 0
      while (gy < gh) {
        var gx = 0
        while (gx < gw) {
          val x0 = gx * w / gw
          val x1 = math.min(w, math.max(x0 + 1, (gx + 1) * w / gw))
          val y0 = gy * h / gh
          val y1 = math.min(h, math.max(y0 + 1, (gy + 1) * h / gh))
          var s = 0.0
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) { s += px(y * w + x); x += 1 }
            y += 1
          }
          grid(gy * gw + gx) = s / ((x1 - x0) * (y1 - y0))
          gx += 1
        }
        gy += 1
      }
      var hash = 0L
      var bit = 0
      while (bit < 64) {
        val by = bit / 8
        val bx = bit % 8
        if (grid(by * gw + bx) > grid(by * gw + bx + 1)) hash |= 1L << bit
        bit += 1
      }
      hash
    }

  /** Perceptual-hash column (nullable LONG — null = undecodable). */
  val imagePHashUdf = udf { (bytes: Array[Byte]) =>
    dhash64(bytes).map(java.lang.Long.valueOf).orNull
  }

  /** Image near-duplicate pairs: perceptual dHash per image, then the
    * SAME pigeonhole candidate machinery the text SimHash path uses
    * ([[Dedup.hammingNearDupPairs]]) — decode cost is one scan,
    * candidate generation never goes quadratic, undecodable payloads
    * drop out via the NULL signature. Output (id_a, id_b, hamming).
    */
  def imageNearDupPairs(
      df: DataFrame,
      idCol: String,
      binCol: String,
      maxHamming: Int = 6,
      maxBucketSize: Int = 10000,
  ): DataFrame =
    Dedup.hammingNearDupPairs(
      df.select(col(idCol), imagePHashUdf(col(binCol)).as("__phash")),
      idCol, "__phash", maxHamming, maxBucketSize)

  private def l2NormalizeInPlace(v: Array[Float]): Unit = {
    var ss = 0.0
    v.foreach(x => ss += x.toDouble * x)
    val nrm = math.sqrt(ss)
    if (nrm > 0) { var j = 0; while (j < v.length) { v(j) = (v(j) / nrm).toFloat; j += 1 } }
  }

  /** REAL image resize: decode (javax.imageio), bilinear-scale to
    * `targetW`×`targetH`, re-encode as PNG. Undecodable payloads pass
    * through unchanged (resize of non-image bytes is undefined —
    * filter on `media_meta.format` upstream to control this).
    */
  def imageResizeUdf(targetW: Int, targetH: Int) = udf { (bytes: Array[Byte]) =>
    if (bytes == null) null
    else {
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) bytes
        else {
          val out = new java.awt.image.BufferedImage(
            targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, targetW, targetH, null)
          g.dispose()
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", baos)
          baos.toByteArray
        }
      } catch { case _: Exception => bytes }
    }
  }

  /** Typed audio features row (nullable column when undecodable). */
  final case class AudioMeta(
      sample_rate: Int,
      channels: Int,
      duration_sec: Double,
      rms: Double,
      zero_cross_rate: Double,
      peak: Double,
  )

  /** REAL audio decode via the JDK's javax.sound.sampled (WAV/AIFF/AU
    * PCM — no external codec): format header + signal statistics of
    * the first channel (RMS level, zero-crossing rate ≈ 2·f/sr for a
    * tone, peak amplitude), samples normalized to [-1, 1]. Frames
    * processed are capped at `maxFrames` so a pathological payload
    * cannot stall a task. None for undecodable payloads (magic-number
    * fast-path first).
    */
  private[graft] def decodeAudioStats(
      bytes: Array[Byte],
      maxFrames: Int = 1 << 22,
  ): Option[AudioMeta] = {
    if (bytes == null || bytes.length < 12) return None
    val riff = bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F'
    val aiff = bytes(0) == 'F' && bytes(1) == 'O' && bytes(2) == 'R' && bytes(3) == 'M'
    val au = bytes(0) == '.' && bytes(1) == 's' && bytes(2) == 'n' && bytes(3) == 'd'
    if (!riff && !aiff && !au) return None
    try {
      val in = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      val bits = fmt.getSampleSizeInBits
      val signed = fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
      if ((bits != 16 && bits != 8) ||
        (!signed && fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED))
        return None
      val channels = fmt.getChannels
      val frameSize = fmt.getFrameSize
      if (frameSize <= 0) return None
      val totalFrames = in.getFrameLength
      // AudioSystem.NOT_SPECIFIED (-1) is legal (an AU payload with
      // the 0xffffffff unknown-size field): read up to maxFrames and
      // let EOF bound the loop instead of sizing a negative buffer
      // (which threw NegativeArraySizeException into the blanket
      // catch — a decodable payload silently yielded no features).
      // Buffer sizing is done in Long and capped by the PAYLOAD: these
      // are raw-PCM containers, so the decoded stream can never carry
      // more frame bytes than the payload itself — without the cap, an
      // unknown-size AU header made every such row eagerly allocate
      // maxFrames*frameSize (~16-32 MB), and a caller-supplied large
      // maxFrames times a wide frame overflowed the Int product
      // negative.
      val payloadFrameCap: Long = bytes.length.toLong / frameSize + 1L
      val declaredCap: Long =
        if (totalFrames < 0) Long.MaxValue else totalFrames
      val framesToRead: Int = math.min(
        math.min(declaredCap, math.max(maxFrames, 0).toLong),
        math.min(payloadFrameCap, (Int.MaxValue - 8).toLong / frameSize)).toInt
      val buf = new Array[Byte](framesToRead * frameSize)
      var off = 0
      var eof = false
      while (off < buf.length && !eof) {
        val n = in.read(buf, off, buf.length - off)
        if (n <= 0) eof = true else off += n
      }
      val frames = off / frameSize
      val big = fmt.isBigEndian
      var sumSq = 0.0
      var peak = 0.0
      var crossings = 0L
      var prevSign = 0
      var f = 0
      while (f < frames) {
        val base = f * frameSize // channel 0 sample leads each frame
        val sample =
          if (bits == 16) {
            val lo = buf(base + (if (big) 1 else 0)) & 0xff
            val hi = buf(base + (if (big) 0 else 1))
            ((hi << 8) | lo).toShort / 32768.0
          } else {
            if (signed) buf(base) / 128.0 else ((buf(base) & 0xff) - 128) / 128.0
          }
        sumSq += sample * sample
        val a = math.abs(sample)
        if (a > peak) peak = a
        val sign = if (sample > 0) 1 else if (sample < 0) -1 else prevSign
        if (prevSign != 0 && sign != 0 && sign != prevSign) crossings += 1
        if (sign != 0) prevSign = sign
        f += 1
      }
      if (frames == 0) return None
      Some(AudioMeta(
        fmt.getSampleRate.toInt,
        channels,
        // declared length when the header carries one (the stats may
        // deliberately sample only maxFrames of it); frames actually
        // read when the header says NOT_SPECIFIED — the old
        // `totalFrames / rate` reported a NEGATIVE duration there
        (if (totalFrames < 0) frames.toDouble else totalFrames.toDouble) /
          fmt.getSampleRate.toDouble,
        math.sqrt(sumSq / frames),
        crossings.toDouble / frames,
        peak,
      ))
    } catch { case _: Exception => None }
  }

  /** Add a nullable `audio_meta` struct decoded from `binCol` —
    * scalar UDF, scan stays columnar; null for non-audio payloads.
    */
  def withAudioFeatures(df: DataFrame, binCol: String): DataFrame = {
    val audioUdf = udf { (bytes: Array[Byte]) => decodeAudioStats(bytes) }
    df.withColumn("audio_meta", audioUdf(col(binCol)))
  }

  /** Deterministic truncate/pad to `targetBytes` — byte-level
    * normalization for OPAQUE payloads (kept for plumbing tests and
    * fixed-width sketches; real image resizing is [[imageResizeUdf]]).
    */
  def resizeStubUdf(targetBytes: Int) = udf { (bytes: Array[Byte]) =>
    if (bytes == null) null
    else if (bytes.length >= targetBytes) bytes.take(targetBytes)
    else bytes ++ new Array[Byte](targetBytes - bytes.length)
  }

  // ----------------------------------------------------------------- video

  /** REAL AVI (RIFF) demux: walks the chunk tree into `LIST movi`
    * (recursing through `LIST rec ` groupings) and returns the video
    * stream's frame payloads — chunks whose fourcc is `##db`/`##dc`
    * (uncompressed/compressed video). For MJPEG AVIs every payload is
    * a complete JPEG, so [[decodePixels]]/[[embedMediaUdf]] decode the
    * sampled frames to pixels with the same JDK ImageIO path as still
    * images. Returns None for non-AVI bytes.
    */
  private[graft] def aviFrames(
      bytes: Array[Byte],
      maxFrames: Int = Int.MaxValue,
  ): Option[Array[Array[Byte]]] = {
    if (bytes == null || bytes.length < 12) return None
    def u8(i: Int): Int = bytes(i) & 0xff
    def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3).toLong << 24)) & 0xffffffffL
    def fourcc(i: Int): String = new String(bytes.slice(i, i + 4), "ISO-8859-1")
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def isVideoChunk(cc: String): Boolean =
      cc.length == 4 && cc(0).isDigit && cc(1).isDigit &&
        (cc.substring(2) == "db" || cc.substring(2) == "dc")
    // walk the chunk list in [from, until); collect only inside movi
    def walk(from: Int, until: Int, inMovi: Boolean): Unit = {
      var i = from
      while (i + 8 <= until && out.length < maxFrames) {
        val cc = fourcc(i)
        val size = le32(i + 4)
        val dataStart = i + 8
        val dataEnd = math.min(until.toLong, dataStart + size).toInt
        if (dataEnd < dataStart) return // corrupt size: stop
        if (cc == "LIST" && dataEnd - dataStart >= 4) {
          val listType = fourcc(dataStart)
          walk(dataStart + 4, dataEnd, inMovi || listType == "movi" || listType == "rec ")
        } else if (inMovi && isVideoChunk(cc) && dataEnd > dataStart) {
          out += bytes.slice(dataStart, dataEnd)
        }
        // chunks are word-aligned: odd sizes carry a pad byte
        i = dataEnd + (size % 2).toInt
      }
    }
    walk(12, bytes.length, inMovi = false)
    Some(out.toArray)
  }

  /** REAL MP4 (ISO BMFF, ISO/IEC 14496-12) demux: walks the box tree
    * into `moov`, picks the first `trak` whose `hdlr` handler is
    * `vide`, and reconstructs every sample's absolute byte range from
    * the sample tables — `stsz` (sizes), `stco`/`co64` (chunk
    * offsets), `stsc` (sample-to-chunk runs). Samples are laid
    * consecutively within each chunk starting at its offset, so the
    * expansion is a single pass over the chunk list. For MJPEG-in-MP4
    * (`jpeg` sample entries) every sample is a complete JPEG the
    * ImageIO path decodes like a still. Returns None for non-MP4
    * bytes or MP4s without a video track.
    */
  private[graft] def mp4Frames(
      bytes: Array[Byte],
      maxFrames: Int = Int.MaxValue,
  ): Option[Array[Array[Byte]]] = {
    if (bytes == null || bytes.length < 16) return None
    def u8(i: Int): Int = bytes(i) & 0xff
    def be32(i: Int): Long =
      ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def boxType(i: Int): String = new String(bytes, i + 4, 4, "ISO-8859-1")
    // children of [from, until): (type, payloadStart, payloadEnd)
    def children(from: Long, until: Long): Seq[(String, Long, Long)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
      var i = from
      while (i + 8 <= until) {
        var size = be32(i.toInt)
        var hdr = 8L
        if (size == 1 && i + 16 <= until) { size = be64(i.toInt + 8); hdr = 16 }
        else if (size == 0) size = until - i
        if (size < hdr || i + size > until) return out.toSeq // corrupt: stop
        out += ((boxType(i.toInt), i + hdr, i + size))
        i += size
      }
      out.toSeq
    }
    def child(cs: Seq[(String, Long, Long)], tp: String): Option[(Long, Long)] =
      cs.collectFirst { case (t, s, e) if t == tp => (s, e) }
    val top = children(0, bytes.length.toLong)
    if (!top.headOption.exists(_._1 == "ftyp")) return None
    def trackFrames(ts: Long, te: Long): Option[Array[Array[Byte]]] = {
      val mc = child(children(ts, te), "mdia") match {
        case Some((ms, me)) => children(ms, me)
        case None => return None
      }
      val isVideo = child(mc, "hdlr").exists { case (hs, he) =>
        // FullBox v+flags(4), pre_defined(4), then handler_type
        he - hs >= 12 && boxType(hs.toInt + 4) == "vide"
      }
      if (!isVideo) return None
      val sc = for {
        minf <- child(mc, "minf")
        stbl <- child(children(minf._1, minf._2), "stbl")
      } yield children(stbl._1, stbl._2)
      sc.flatMap { sc =>
        for {
          stsz <- child(sc, "stsz")
          stsc <- child(sc, "stsc")
          co <- child(sc, "stco").map((_, false)).orElse(child(sc, "co64").map((_, true)))
        } yield {
          val ((cs, _), is64) = co
          val uniform = be32(stsz._1.toInt + 4)
          val sampleCount = be32(stsz._1.toInt + 8).toInt
          def sampleSize(s: Int): Long =
            if (uniform != 0) uniform else be32(stsz._1.toInt + 12 + 4 * s)
          val chunkCount = be32(cs.toInt + 4).toInt
          def chunkOffset(c: Int): Long =
            if (is64) be64(cs.toInt + 8 + 8 * c) else be32(cs.toInt + 8 + 4 * c)
          val runCount = be32(stsc._1.toInt + 4).toInt
          def run(r: Int): (Long, Long) = // (first_chunk 1-based, samples_per_chunk)
            (be32(stsc._1.toInt + 8 + 12 * r), be32(stsc._1.toInt + 12 + 12 * r))
          val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
          var sample = 0
          var r = 0
          var c = 0
          // the maxFrames bound stops the demux (and its per-sample
          // byte copies) as soon as enough frames landed — the
          // metadata path reads ONE frame of a 500 MB video, not a
          // full copy of every sample
          while (c < chunkCount && sample < sampleCount && out.length < maxFrames) {
            while (r + 1 < runCount && run(r + 1)._1 <= c + 1) r += 1
            val spc = if (runCount == 0) 0L else run(r)._2
            var off = chunkOffset(c)
            var s = 0L
            while (s < spc && sample < sampleCount && out.length < maxFrames) {
              val sz = sampleSize(sample)
              if (off >= 0 && sz > 0 && off + sz <= bytes.length)
                out += java.util.Arrays.copyOfRange(bytes, off.toInt, (off + sz).toInt)
              off += sz
              sample += 1
              s += 1
            }
            c += 1
          }
          out.toArray
        }
      }
    }
    child(top, "moov").flatMap { case (ms, me) =>
      children(ms, me).filter(_._1 == "trak")
        .iterator
        .map { case (_, ts, te) => trackFrames(ts, te) }
        .collectFirst { case Some(f) => f }
    }
  }

  /** REAL Matroska/WebM (EBML) demux: parses the VINT element tree —
    * Segment → Tracks → TrackEntry to find the first video track
    * (TrackType 1), then Cluster → SimpleBlock / BlockGroup→Block
    * payloads for that track, expanding all three lacing schemes
    * (Xiph 255-run sizes, fixed equal split, EBML signed-VINT
    * deltas). Returns None for non-EBML bytes or files without a
    * video track.
    */
  private[graft] def mkvFrames(
      bytes: Array[Byte],
      maxFrames: Int = Int.MaxValue,
  ): Option[Array[Array[Byte]]] = {
    if (bytes == null || bytes.length < 8) return None
    def u8(i: Int): Int = bytes(i) & 0xff
    if (!(u8(0) == 0x1a && u8(1) == 0x45 && u8(2) == 0xdf && u8(3) == 0xa3)) return None
    // EBML VINT: leading-zero count of the first byte gives the
    // width; ids keep the marker bit, sizes drop it
    def vintWidth(i: Int): Int = {
      val b0 = u8(i)
      if (b0 == 0) -1 else java.lang.Integer.numberOfLeadingZeros(b0) - 23
    }
    def vintId(i: Int, w: Int): Long = {
      var v = 0L
      var j = 0
      while (j < w) { v = (v << 8) | u8(i + j); j += 1 }
      v
    }
    def vintSize(i: Int, w: Int): Long = {
      var v = (u8(i) & (0xff >>> w)).toLong
      val allOnes = (1L << (7 * w)) - 1
      var j = 1
      while (j < w) { v = (v << 8) | u8(i + j); j += 1 }
      if (v == allOnes) -1L else v // -1 = unknown size (to end)
    }
    final case class El(id: Long, payloadStart: Int, payloadEnd: Int)
    def children(from: Int, until: Int): Seq[El] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[El]
      var i = from
      while (i < until) {
        val iw = vintWidth(i)
        if (iw < 1 || iw > 4 || i + iw >= until) return out.toSeq
        val id = vintId(i, iw)
        val sw = vintWidth(i + iw)
        if (sw < 1 || sw > 8 || i + iw + sw > until) return out.toSeq
        val sz = vintSize(i + iw, sw)
        val ps = i + iw + sw
        val pe = if (sz < 0) until else math.min(until.toLong, ps + sz).toInt
        if (pe < ps) return out.toSeq
        out += El(id, ps, pe)
        i = pe
      }
      out.toSeq
    }
    def uint(e: El): Long = {
      var v = 0L
      var i = e.payloadStart
      while (i < e.payloadEnd) { v = (v << 8) | u8(i); i += 1 }
      v
    }
    val top = children(0, bytes.length)
    val seg = top.find(_.id == 0x18538067L).getOrElse(return None)
    val segKids = children(seg.payloadStart, seg.payloadEnd)
    // pass 1: the first TrackEntry with TrackType == 1 (video)
    val videoTrack = (for {
      tracks <- segKids.filter(_.id == 0x1654ae6bL)
      entry <- children(tracks.payloadStart, tracks.payloadEnd).filter(_.id == 0xaeL)
      kids = children(entry.payloadStart, entry.payloadEnd)
      if kids.exists(k => k.id == 0x83L && uint(k) == 1L)
      num <- kids.find(_.id == 0xd7L).map(uint)
    } yield num).headOption.getOrElse(return None)
    // pass 2: block payloads for that track. Lacing (flags bits
    // 0x06): 0 = none, 01 = Xiph (255-run size bytes), 10 = fixed
    // (equal split), 11 = EBML (VINT first size, signed-VINT deltas)
    def blockFrames(e: El): Seq[Array[Byte]] = {
      val tw = vintWidth(e.payloadStart)
      if (tw < 1 || e.payloadStart + tw + 3 > e.payloadEnd) return Nil
      val track = vintSize(e.payloadStart, tw)
      if (track != videoTrack) return Nil
      val flags = u8(e.payloadStart + tw + 2)
      val dataStart = e.payloadStart + tw + 3
      (flags & 0x06) match {
        case 0x00 =>
          Seq(java.util.Arrays.copyOfRange(bytes, dataStart, e.payloadEnd))
        case lacing =>
          if (dataStart >= e.payloadEnd) return Nil
          val nFrames = u8(dataStart) + 1
          var i = dataStart + 1
          val sizes = new Array[Int](nFrames)
          lacing match {
            case 0x02 => // Xiph: per frame (except last), bytes summing until a byte < 255
              var f = 0
              while (f < nFrames - 1) {
                var s = 0
                var b = 255
                while (b == 255 && i < e.payloadEnd) { b = u8(i); s += b; i += 1 }
                sizes(f) = s
                f += 1
              }
            case 0x04 => // fixed: equal split of the remaining payload
              val each = (e.payloadEnd - i) / nFrames
              java.util.Arrays.fill(sizes, each)
            case _ => // 0x06 EBML: first absolute VINT, then signed-VINT
              // deltas — sizes cover every frame EXCEPT the last, so a
              // single-frame lace (count byte 0, legal) carries NO size
              // fields at all; reading one anyway would eat the frame's
              // leading bytes as a bogus VINT
              if (nFrames > 1) {
                val w0 = vintWidth(i)
                if (w0 < 1 || i + w0 > e.payloadEnd) return Nil
                var prev = vintSize(i, w0).toInt
                i += w0
                sizes(0) = prev
                var f = 1
                while (f < nFrames - 1) {
                  val w = vintWidth(i)
                  if (w < 1 || i + w > e.payloadEnd) return Nil
                  // signed VINT: unsigned value minus (2^(7w-1) - 1)
                  val delta = vintSize(i, w) - ((1L << (7 * w - 1)) - 1)
                  i += w
                  prev = (prev + delta).toInt
                  sizes(f) = prev
                  f += 1
                }
              }
          }
          // last frame (all schemes): the remainder
          if (nFrames >= 1 && (lacing == 0x02 || lacing == 0x06)) {
            val used = sizes.take(nFrames - 1).map(_.toLong).sum
            sizes(nFrames - 1) = (e.payloadEnd - i - used).toInt
          }
          // frames are concatenated right after the size table
          val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
          var off = i.toLong
          var f = 0
          while (f < nFrames) {
            val sz = sizes(f)
            if (sz < 0 || off + sz > e.payloadEnd) return out.toSeq
            out += java.util.Arrays.copyOfRange(bytes, off.toInt, (off + sz).toInt)
            off += sz
            f += 1
          }
          out.toSeq
      }
    }
    // bounded cluster walk: stop demuxing (and copying block payloads)
    // as soon as maxFrames frames landed — the metadata path reads one
    // frame, not every block of the file
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val clusters = segKids.filter(_.id == 0x1f43b675L).iterator
    while (frames.length < maxFrames && clusters.hasNext) {
      val cluster = clusters.next()
      val els = children(cluster.payloadStart, cluster.payloadEnd).iterator
      while (frames.length < maxFrames && els.hasNext) {
        val el = els.next()
        val fs = el.id match {
          case 0xa3L => blockFrames(el) // SimpleBlock
          case 0xa0L => // BlockGroup → Block
            children(el.payloadStart, el.payloadEnd)
              .filter(_.id == 0xa1L).flatMap(blockFrames)
          case _ => Nil
        }
        fs.iterator.take(maxFrames - frames.length).foreach(frames += _)
      }
    }
    Some(frames.toArray)
  }

  /** Real container demux where a walker exists (AVI RIFF, MP4
    * ISO BMFF, Matroska/WebM EBML); None otherwise.
    */
  private[graft] def demuxFrames(
      bytes: Array[Byte],
      maxFrames: Int = Int.MaxValue,
  ): Option[Array[Array[Byte]]] =
    aviFrames(bytes, maxFrames)
      .orElse(mp4Frames(bytes, maxFrames))
      .orElse(mkvFrames(bytes, maxFrames))

  /** Frame sampler: REAL container demux for AVI, MP4, and
    * Matroska/WebM payloads (every `stride`-th video frame, ≤
    * `maxFrames`); payloads no walker recognizes fall back to the
    * labelled byte-chunk STUB (stride-th `frameBytes` slice) so the
    * plumbing still exercises for exotic containers. Output
    * `array<binary>`, one row per video — downstream `explode`
    * controls fan-out explicitly.
    */
  def frameSampleUdf(frameBytes: Int, stride: Int, maxFrames: Int = 64) = {
    // validate at CONSTRUCTION: stride = 0 would otherwise divide by
    // zero (and frameBytes = 0 would throw from grouped) per-task,
    // deep inside executors — the chunkTokens parameter policy
    require(frameBytes > 0, s"frameBytes must be positive: $frameBytes")
    require(stride > 0, s"stride must be positive: $stride")
    require(maxFrames > 0, s"maxFrames must be positive: $maxFrames")
    // sampling every stride-th frame up to maxFrames touches at most
    // (maxFrames-1)·stride + 1 demuxed frames — bound the demux there
    // so a 500 MB video never materializes frames the sampler drops
    val demuxCap =
      math.min(Int.MaxValue.toLong, (maxFrames.toLong - 1) * stride + 1).toInt
    udf { (bytes: Array[Byte]) =>
      if (bytes == null) Array.empty[Array[Byte]]
      else demuxFrames(bytes, demuxCap) match {
        case Some(frames) =>
          frames.zipWithIndex.collect {
            case (f, i) if i % stride == 0 => f
          }.take(maxFrames)
        case None => // STUB fallback for undemuxable containers
          bytes.grouped(frameBytes).zipWithIndex.collect {
            case (chunk, i) if i % stride == 0 => chunk
          }.take(maxFrames).toArray
      }
    }
  }
}
