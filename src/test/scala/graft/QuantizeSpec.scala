package graft

import org.apache.spark.sql.functions._

import graft.operators.Quantize

class QuantizeSpec extends SparkTestBase {
  import spark.implicits._

  test("int8 roundtrip error ≤ 0.5/scale per component; zero vectors stay zero") {
    val rng = new scala.util.Random(21)
    val vecs = (1L to 200L).map(i =>
      (i, Seq.fill(16)((rng.nextGaussian() * (1 + i % 7)).toFloat))) :+
      (999L, Seq.fill(16)(0f))
    val df = vecs.toDF("vec_id", "embedding")
    val q = Quantize.int8Symmetric(df, "embedding")
    val rows = q
      .select(
        col("vec_id"),
        col("embedding"),
        col("scale"),
        Quantize.dequantize(col("vec_q"), col("scale")).as("deq"),
      )
      .as[(Long, Seq[Float], Double, Seq[Double])]
      .collect()
    rows.foreach { case (id, orig, scale, deq) =>
      if (scale == 0.0) assert(deq.forall(_ == 0.0), s"zero vec $id")
      else {
        val bound = 0.5 / scale + 1e-12
        orig.zip(deq).foreach { case (x, d) =>
          assert(math.abs(x.toDouble - d) <= bound, s"vec $id: |$x - $d| > $bound")
        }
      }
    }
  }

  test("quantized codes span the int8 range and max component hits ±127") {
    val df = Seq((1L, Seq(1.0f, -2.0f, 0.5f, 2.0f))).toDF("vec_id", "embedding")
    val q = Quantize.int8Symmetric(df, "embedding")
      .select($"vec_q").as[Seq[Byte]].head()
    assert(q == Seq[Byte](64, -127, 32, 127), s"got $q")
  }

  test("signPack matches a reference bit-packer; empty vector gives empty code") {
    val rng = new scala.util.Random(33)
    val vecs = (1L to 100L).map(i =>
      (i, Seq.fill(1 + (i % 70).toInt)(rng.nextGaussian().toFloat))) :+
      (999L, Seq.empty[Float])
    val df = vecs.toDF("vec_id", "embedding")
    val got = df
      .select(col("vec_id"), Quantize.signPack(col("embedding")).as("code"))
      .as[(Long, Seq[Long])]
      .collect()
      .toMap
    vecs.foreach { case (id, v) =>
      val expected = (0 until (v.length + 31) / 32).map { w =>
        (0 until 32).foldLeft(0L) { (acc, i) =>
          val idx = w * 32 + i
          if (idx < v.length && v(idx) > 0f) acc | (1L << i) else acc
        }
      }
      assert(got(id) == expected, s"vec $id")
    }
  }

  test("hammingDist counts exactly the differing sign bits") {
    val a = Seq.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)
    // flip signs at 5 known positions
    val flips = Set(3, 17, 31, 32, 63)
    val b = a.zipWithIndex.map { case (x, i) => if (flips(i)) -x else x }
    val df = Seq((a, b)).toDF("a", "b")
    val d = df
      .select(
        Quantize
          .hammingDist(Quantize.signPack(col("a")), Quantize.signPack(col("b")))
          .as("d"))
      .as[Long]
      .head()
    assert(d == flips.size, s"got $d")
  }

  test("native sign_pack / hamming_dist ≡ the portable functions formulation") {
    val rng = new scala.util.Random(57)
    val df = (1L to 80L)
      .map(i => (i,
        Seq.fill(1 + (i % 67).toInt)(rng.nextGaussian().toFloat),
        Seq.fill(1 + (i % 67).toInt)(rng.nextGaussian().toFloat)))
      .toDF("id", "a", "b")
    val mismatches = df
      .select(
        (Quantize.signPack(col("a")) === Quantize.signPackPortable(col("a"))).as("p"),
        (Quantize
          .hammingDist(Quantize.signPack(col("a")), Quantize.signPack(col("b"))) ===
          Quantize.hammingDistPortable(
            Quantize.signPackPortable(col("a")), Quantize.signPackPortable(col("b")))).as("h"))
      .where(!col("p") || !col("h"))
      .count()
    assert(mismatches == 0L)
    // empty vector: both formulations give an empty code
    val empty = Seq(Tuple1(Seq.empty[Float])).toDF("a")
    assert(empty.select(Quantize.signPack(col("a"))).as[Seq[Long]].head().isEmpty)
    assert(empty.select(Quantize.signPackPortable(col("a"))).as[Seq[Long]].head().isEmpty)
  }

  test("SQL registration: z_value / simhash64 / shingle_set usable from spark.sql") {
    graft.functions.VectorExpressions.register(spark)
    val r = spark
      .sql("SELECT z_value(5L, 3L) AS z, simhash64('hello world') AS sh, " +
        "size(shingle_set('a b c d', 3)) AS ns")
      .head()
    assert(r.getAs[Long]("z") == 27L)
    assert(r.getAs[Long]("sh") == graft.textutil.TextHash.simhash64("hello world"))
    assert(r.getAs[Int]("ns") == 2)
    val n = spark
      .sql("SELECT unicode_normalize('cafe\u0301') AS c, " +
        "unicode_normalize('ef\uFB01cient', 'NFKC') AS k")
      .head()
    assert(n.getAs[String]("c") == "caf\u00E9")
    assert(n.getAs[String]("k") == "efficient")
  }
}
