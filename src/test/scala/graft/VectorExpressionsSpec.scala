package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions
import graft.operators.Similarity

class VectorExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = Seq(
    (Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)),
    (Seq(0.5f, -0.25f), Seq(2f, 4f)),
  ).toDF("a", "b")

  test("vec_dot equals interpreted HOF dot bit-for-bit") {
    val rows = df
      .select(
        VectorExpressions.vecDot($"a", $"b").as("native"),
        Similarity.dotCol($"a", $"b").as("hof"),
      )
      .collect()
    rows.foreach { r =>
      assert(
        java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"native=${r.getDouble(0)} hof=${r.getDouble(1)}",
      )
    }
  }

  test("vec_cosine equals cosineCol bit-for-bit") {
    val rows = df
      .select(
        VectorExpressions.vecCosine($"a", $"b").as("native"),
        Similarity.cosineCol($"a", $"b").as("hof"),
      )
      .collect()
    rows.foreach { r =>
      assert(
        java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)),
      )
    }
  }

  test("vec_norm value and null propagation") {
    val n = df.select(VectorExpressions.vecNorm($"a")).as[Double].collect()
    assert(math.abs(n(0) - math.sqrt(1 + 4 + 9)) < 1e-12)
    val withNull = Seq((Option.empty[Seq[Float]], Seq(1f))).toDF("a", "b")
    val r = withNull.select(
      VectorExpressions.vecNorm($"a"),
      VectorExpressions.vecDot($"a", $"b"),
    ).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("SQL registration via extensions surface: vec_dot usable from spark.sql") {
    VectorExpressions.register(spark)
    val out = spark
      .sql("SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .as[Double]
      .head()
    assert(out == 11.0)
  }

  test("sorted_intersect_count equals size(array_intersect) on sorted-distinct arrays") {
    // deterministic pseudo-random sorted distinct long sets, incl. the
    // edge shapes: empty×empty, empty×full, disjoint, identical
    val rng = new scala.util.Random(7)
    val cases = Seq(
      (Array.empty[Long], Array.empty[Long]),
      (Array.empty[Long], Array(1L, 5L, 9L)),
      (Array(1L, 2L, 3L), Array(4L, 5L, 6L)),
      (Array(1L, 2L, 3L), Array(1L, 2L, 3L)),
      (Array(Long.MinValue, -7L, 0L, Long.MaxValue), Array(-7L, Long.MaxValue)),
    ) ++ (1 to 20).map { _ =>
      def gen() = Array.fill(rng.nextInt(50))(rng.nextInt(60).toLong).distinct.sorted
      (gen(), gen())
    }
    val df = cases.toDF("a", "b")
    val rows = df.select(
      VectorExpressions.sortedIntersectCount($"a", $"b").as("native"),
      size(array_intersect($"a", $"b")).as("builtin"),
    ).collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1), s"$r"))
    val withNull = Seq((Option.empty[Seq[Long]], Seq(1L))).toDF("a", "b")
    assert(withNull.select(VectorExpressions.sortedIntersectCount($"a", $"b")).head().isNullAt(0))
  }

  test("expressions run inside whole-stage codegen on a realistic plan") {
    val e = spark.read.parquet(s"$Sf0001/embeddings.parquet")
    val plan = e
      .select(VectorExpressions.vecNorm($"embedding").as("n"))
      .queryExecution
      .executedPlan
      .toString
    // "*(1)" prefix marks the WholeStageCodegen stage in simple-mode plans
    assert(plan.contains("*(1) Project [vec_norm"), plan.take(500))
  }
}
