package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.ZOrderValue

import graft.operators.Layout

class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  /** Naive per-bit reference interleave. */
  private def naive(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 32) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("magic-constant interleave ≡ naive per-bit loop (incl. edge values)") {
    val rng = new scala.util.Random(17)
    val cases = Seq(
      (0L, 0L), (5L, 3L), (1L, 0L), (0L, 1L),
      (0xffffffffL, 0L), (0L, 0xffffffffL), (0xffffffffL, 0xffffffffL),
      (1L << 33, 7L), (-1L, 2L), // out-of-domain inputs: low 32 bits only
    ) ++ Seq.fill(200)((rng.nextLong() & 0xffffffffL, rng.nextLong() & 0xffffffffL))
    cases.foreach { case (a, b) =>
      assert(ZOrderValue.interleave(a, b) == naive(a, b), s"mismatch on ($a, $b)")
    }
    assert(ZOrderValue.interleave(5L, 3L) == 27L) // 101 ⨯ 011 → 011011
  }

  test("expression through codegen equals the scala kernel") {
    val df = (0 until 500)
      .map(_ => (scala.util.Random.nextInt(1 << 16).toLong, scala.util.Random.nextInt(1 << 16).toLong))
      .toDF("a", "b")
    val rows = df
      .select(col("a"), col("b"), Layout.zValue(col("a"), col("b")).as("z"))
      .as[(Long, Long, Long)]
      .collect()
    rows.foreach { case (a, b, z) => assert(z == ZOrderValue.interleave(a, b)) }
  }

  test("zOrderLayout bounds BOTH columns' per-partition ranges (data skipping)") {
    // 64×64 grid; after z-order range layout, a filter on EITHER column
    // should be able to skip most partitions via min/max stats
    val grid = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)
    val df = scala.util.Random.shuffle(grid).toDF("x", "y").repartition(16)
    val laid = Layout.zOrderLayout(df, "x", "y", numPartitions = 16)
    val stats = laid
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(min("x").as("xmin"), max("x").as("xmax"), min("y").as("ymin"), max("y").as("ymax"))
      .collect()
      .map(r => (r.getAs[Long]("xmin"), r.getAs[Long]("xmax"),
        r.getAs[Long]("ymin"), r.getAs[Long]("ymax")))
    assert(stats.nonEmpty)
    // point filter on x (resp. y): fraction of partitions whose min/max
    // range must be read, averaged over all 64 predicate values
    def avgHitFraction(ranges: Array[(Long, Long)]): Double =
      (0L until 64L).map(v => ranges.count(r => r._1 <= v && v <= r._2).toDouble / ranges.length)
        .sum / 64.0
    val xHit = avgHitFraction(stats.map(s => (s._1, s._2)))
    val yHit = avgHitFraction(stats.map(s => (s._3, s._4)))
    // a plain sort bounds one dimension (hit≈tiny) and leaves the other
    // at 100%; z-order must prune meaningfully on BOTH
    assert(xHit < 0.75, s"x avg hit fraction $xHit")
    assert(yHit < 0.75, s"y avg hit fraction $yHit")
  }
}
