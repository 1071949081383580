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

  test("SQL registration: z_value / simhash64 / shingle_set usable from spark.sql") {
    graft.functions.VectorExpressions.register(spark)
    val r = spark
      .sql("SELECT z_value(5L, 3L) AS z, simhash64('hello world') AS sh, " +
        "size(shingle_set('a b c d', 3)) AS ns")
      .head()
    assert(r.getAs[Long]("z") == 27L)
    assert(r.getAs[Long]("sh") == graft.textutil.TextHash.simhash64("hello world"))
    assert(r.getAs[Int]("ns") == 2)
  }
}
