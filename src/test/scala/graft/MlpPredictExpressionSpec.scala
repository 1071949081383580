package graft

import org.apache.spark.sql.functions._

import graft.ml.{Mlp, ModelRegistry}

class MlpPredictExpressionSpec extends SparkTestBase {
  import spark.implicits._

  private def freshModel(name: String): Mlp = {
    val m = Mlp.fromSpec(
      name,
      """{"layers":[{"in":3,"out":8,"activation":"tanh"},{"in":8,"out":2}]}""",
    )
    ModelRegistry.put(m)
    m
  }

  test("native predict column equals direct Mlp.predict bit-for-bit") {
    val m = freshModel("expr_model")
    val rows = Seq(Seq(1f, 2f, 3f), Seq(-0.5f, 0f, 4f)).map(Tuple1(_))
    val df = rows.toDF("f")
    val out = df
      .select(MlFunctions.predictCol(spark, "expr_model", $"f").as("p"))
      .as[Seq[Float]]
      .collect()
    rows.map(_._1).zip(out).foreach { case (in, got) =>
      assert(got == m.predict(in.toArray).toSeq)
    }
  }

  test("null input → null prediction; wrong width → named error") {
    freshModel("expr_null")
    val df = Seq(Tuple1(Option.empty[Seq[Float]]), Tuple1(Some(Seq(1f, 2f, 3f)))).toDF("f")
    val out = df.select(MlFunctions.predictCol(spark, "expr_null", $"f").as("p")).collect()
    assert(out.exists(_.isNullAt(0)) && out.exists(!_.isNullAt(0)))
    val bad = Seq(Tuple1(Seq(1f))).toDF("f")
    val e = intercept[Exception] {
      bad.select(MlFunctions.predictCol(spark, "expr_null", $"f")).collect()
    }
    assert(e.getMessage.contains("expr_null") || e.getCause != null)
  }

  test("runs inside whole-stage codegen and on parquet-scanned data") {
    freshModel("expr_codegen")
    val li = spark.read
      .parquet(s"$Sf0001/lineitem.parquet")
      .select(
        array(
          col("l_quantity").cast("float"),
          col("l_discount").cast("float"),
          col("l_tax").cast("float"),
        ).as("f"),
      )
    val scored = li.select(MlFunctions.predictCol(spark, "expr_codegen", $"f").as("p"))
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)") && plan.contains("ml_pred_expr_codegen"), plan.take(400))
    assert(scored.where(size($"p") === 2).count() == li.count())
  }
}
