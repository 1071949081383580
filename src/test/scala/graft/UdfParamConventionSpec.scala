package graft

import org.apache.spark.sql.functions._

/** Pins the premise of the repo-wide UDF vector-parameter convention
  * (SCALE.md "UDF vector parameters"): a `Seq[Float]` UDF parameter
  * deserializes to a linear-access List — so an indexed while-loop
  * kernel on it is O(dim²) per row — while an `Array[Float]`
  * parameter arrives as the primitive float[] (measured ~130× faster
  * on a dim-2048 indexed loop). If a Spark upgrade ever changes the
  * Seq deserializer to an indexed sequence, this spec fails and the
  * convention note can be revisited; until then every per-row vector
  * kernel takes Array[Float].
  */
class UdfParamConventionSpec extends SparkTestBase {
  import spark.implicits._

  test("Seq[Float] UDF params deserialize to a linear Seq; Array[Float] to primitive float[]") {
    val seqClass = udf((v: Seq[Float]) => v.getClass.getName)
    val arrClass = udf((v: Array[Float]) => v.getClass.getName)
    val base = Seq((1L, Seq(1.0f, 2.0f, 3.0f))).toDF("id", "vec")
    // every source shape hands the Seq form a List (checked on toDF
    // here; parquet, UDF output, and localCheckpoint shapes were
    // probed identically when the convention was adopted)
    val mk = udf((i: Long) => Array.fill(3)(i.toFloat))
    val viaUdf = base.select(mk($"id").as("vec"))
    for (df <- Seq(base, viaUdf, viaUdf.localCheckpoint(true))) {
      val s = df.select(seqClass($"vec")).head().getString(0)
      assert(classOf[scala.collection.LinearSeq[_]].isAssignableFrom(Class.forName(s)),
        s"Seq[Float] UDF param is $s — if this became an IndexedSeq, the " +
          "Array[Float] kernel convention's premise changed (see SCALE.md)")
      assert(df.select(arrClass($"vec")).head().getString(0) == "[F",
        "Array[Float] UDF param must arrive as the primitive float[]")
    }
  }

  /** Source-level pin of the convention the runtime probe above
    * justifies: in main, (a) every `Row.getSeq[Float]` result must be
    * `.toArray`-ed (or routed through `seqToFloats`, the validating
    * converter) before any kernel can index it, and (b) the type
    * `Seq[Float]` must not appear in signatures at all — only in
    * comments and in `seqToFloats`'s own parameter. A new operator
    * that reverts to a boxed-seq kernel fails HERE instead of
    * resurfacing as a jstack hunt under a wedged dim-2048 job (the
    * round-17 discovery).
    */
  test("main sources: getSeq[Float] is always .toArray-ed; Seq[Float] never in a signature") {
    val root = new java.io.File("src/main/scala")
    assert(root.isDirectory, s"expected to run from the repo root; cwd=${new java.io.File(".").getAbsolutePath}")
    def walk(f: java.io.File): Iterator[java.io.File] =
      if (f.isDirectory) f.listFiles().iterator.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Iterator.single(f) else Iterator.empty
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    walk(root).foreach { f =>
      val text = new String(
        java.nio.file.Files.readAllBytes(f.toPath), java.nio.charset.StandardCharsets.UTF_8)
      // (a) every getSeq[Float]/getSeq[Long](…) — the two hot vector
      // element types (embeddings; minhash signatures / packed codes)
      // — must see .toArray within the next 200 chars (covers the
      // null-check-then-convert shape) or sit inside a
      // seqToFloats(...) call
      for (needle <- Seq("getSeq[Float]", "getSeq[Long]")) {
        var ix = text.indexOf(needle)
        while (ix >= 0) {
          val after = text.substring(ix, math.min(text.length, ix + needle.length + 200))
          val before = text.substring(math.max(0, ix - 40), ix)
          if (!after.contains(".toArray") && !before.contains("seqToFloats("))
            offenders += s"${f.getPath}: $needle without .toArray at char $ix"
          ix = text.indexOf(needle, ix + 1)
        }
      }
      // (b) `Seq[Float]` only in comments or the seqToFloats converter
      text.linesIterator.zipWithIndex.foreach { case (line, n) =>
        val t = line.trim
        val comment = t.startsWith("//") || t.startsWith("*") || t.startsWith("/*")
        // getSeq[Float] call sites are rule (a)'s domain, not a
        // signature-level Seq[Float]
        if (line.replace("getSeq[Float]", "").contains("Seq[Float]")
          && !comment && !line.contains("def seqToFloats"))
          offenders += s"${f.getPath}:${n + 1}: Seq[Float] in a non-comment line"
      }
    }
    assert(offenders.isEmpty,
      "boxed-seq convention violations (SCALE.md 'UDF vector parameters'):\n" +
        offenders.mkString("\n"))
  }
}
