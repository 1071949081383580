package graft

import org.apache.spark.sql.functions._

import graft.ml.ModelRegistry
import graft.sql.Macros

/** Mirrors of the reference's sqllogictest corpus
  * (test/sql/functions.test, test/sql/autompg.test, and the
  * test/sql/autompg.sql demo pipeline) driven through the Spark SQL
  * surface.
  */
class MlFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private val autoMpgCsv = "/root/reference/test/auto_mpg.csv"

  test("functions.test mirror: create → list → train(1 sample) → pred over range+random") {
    MlFunctions.registerAll(spark)
    // ml_create (functions.test:4)
    val status = MlFunctions.create(
      spark,
      "m1",
      """{"layers":[{"in":2,"out":8,"activation":"relu"},{"in":8,"out":1}]}""",
    )
    assert(status == "Ok")
    // ml_list (functions.test:7) via the ml_models view
    val listed = spark.sql("SELECT model, json FROM ml_models WHERE model = 'm1'").collect()
    assert(listed.length == 1)
    assert(listed.head.getString(1).contains("\"in\":2"))
    // ml_train on a single literal sample (functions.test:10) — empty
    // train split (30% of 1 = 0 rows) must not crash
    val one = Seq((Seq(0f, 0f), Seq(0f))).toDF("f", "t")
    val trained = MlFunctions.train(one, "m1", $"f", $"t")
    assert(trained.select("prediction").head().getSeq[Float](0).length == 1)
    // ml_pred over range(3) with random() features (functions.test:13-14,
    // S17+S18) — nondeterministic input, so assert shape only
    val preds = spark
      .sql("SELECT ml_pred('m1', array(CAST(random() AS FLOAT), CAST(random() AS FLOAT))) AS p FROM range(3)")
      .collect()
    assert(preds.length == 3)
    assert(preds.forall(_.getSeq[Float](0).length == 1))
  }

  test("autompg pipeline mirror: CSV scan, scaling macros, train, in-SQL predict") {
    // S1: CSV scan with header + inference (autompg.sql:12)
    val autompg = spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(autoMpgCsv)
    assert(autompg.count() == 392)
    val featureCols = Seq("cylinders", "displacement", "horsepower", "weight", "acceleration")

    // scaling_params + min_max_scaler macros (autompg.sql:4-16) over
    // features AND target, as the demo does (autompg.sql:60-72)
    val scaled = Macros.minMaxScale(autompg, featureCols :+ "mpg")
    val mn = scaled.agg(min("weight"), max("weight")).head()
    assert(mn.getDouble(0) >= 0.0 && mn.getDouble(1) <= 1.0)

    // 5→64→32→1 relu net (autompg.sql:18-23)
    MlFunctions.create(
      spark,
      "mpg_reg",
      """{"layers":[
        |{"in":5,"out":64,"activation":"relu"},
        |{"in":64,"out":32,"activation":"relu"},
        |{"in":32,"out":1}]}""".stripMargin,
    )
    val withArrays = scaled.select(
      array(featureCols.map(c => col(c).cast("float")): _*).as("features"),
      array(col("mpg").cast("float")).as("targets"),
      col("weight"),
    )
    // heavy test config (autompg.test:22), whole-input training
    MlFunctions.train(
      withArrays,
      "mpg_reg",
      $"features",
      $"targets",
      """{"epochs":60,"learning_rate":0.003,"batch_size":32,"seed":42}""",
      orderBy = Seq($"weight", $"features"(0)),
      trainFraction = 1.0,
      log = _ => (),
    )
    val stats = MlFunctions.lastStats.get
    assert(stats.epochTrainMse.last < 0.03,
      s"scaled-mpg MSE should drop well below variance: ${stats.epochTrainMse.last}")
    assert(stats.epochTrainMse.last < stats.epochTrainMse.head,
      "loss must decrease over training")

    // in-SQL inference over the scaled relation (autompg.test:19)
    withArrays.createOrReplaceTempView("autompg_scaled")
    MlFunctions.publish(spark)
    val preds = spark.sql(
      "SELECT ml_pred('mpg_reg', features) AS p FROM autompg_scaled",
    )
    assert(preds.where(size($"p") === 1).count() == 392)
  }

  test("SQL ml_train aggregate: trains whole relation from pure SQL (functions.test:10 form)") {
    MlFunctions.registerAll(spark)
    MlFunctions.create(
      spark,
      "sqltrain",
      """{"layers":[{"in":2,"out":8,"activation":"relu"},{"in":8,"out":1}]}""",
    )
    Seq(
      (Seq(0f, 0f), Seq(0f)),
      (Seq(1f, 0f), Seq(1f)),
      (Seq(0f, 1f), Seq(1f)),
      (Seq(1f, 1f), Seq(2f)),
    ).toDF("f", "t").createOrReplaceTempView("xor_ish")
    // 3-arg default-config form
    val ok = spark.sql("SELECT ml_train('sqltrain', f, t) AS status FROM xor_ish").head().getString(0)
    assert(ok == "Ok")
    // 4-arg config form
    val ok2 = spark
      .sql("""SELECT ml_train_cfg('sqltrain', f, t, '{"epochs":20,"seed":7}') FROM xor_ish""")
      .head()
      .getString(0)
    assert(ok2 == "Ok")
    // trained weights visible to subsequent ml_pred after re-publish
    MlFunctions.publish(spark)
    val p = spark
      .sql("SELECT ml_pred('sqltrain', array(CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS p")
      .head()
      .getSeq[Float](0)
    assert(p.length == 1 && !p.head.isNaN)
  }

  test("autompg.test SQL shape verbatim: ml_train over the relation yields 392 arity-1 prediction rows") {
    MlFunctions.registerAll(spark)
    val autompg = spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(autoMpgCsv)
    val featureCols = Seq("cylinders", "displacement", "horsepower", "weight", "acceleration")
    Macros.minMaxScale(autompg, featureCols :+ "mpg")
      .select(
        array(featureCols.map(c => col(c).cast("float")): _*).as("features"),
        array(col("mpg").cast("float")).as("targets"),
      )
      .createOrReplaceTempView("train_data")
    spark.sql(
      """SELECT ml_create('mpg_sql', '{"layers":[{"in":5,"out":16,"activation":"relu"},{"in":16,"out":1}]}')""",
    ).collect()
    // the reference's SELECT ml_train(...) FROM train_data returns one
    // prediction list PER ROW (src/lib.rs:175-176, autompg.test:16,22);
    // trainSql reproduces that shape: aggregate-train → republish → ml_pred
    val preds = MlFunctions.trainSql(
      spark, "mpg_sql", "train_data", "features", "targets",
      configJson = """{"epochs":5,"seed":42}""",
    ).collect()
    assert(preds.length == 392, s"expected 392 prediction rows, got ${preds.length}")
    assert(preds.forall(r => r.getSeq[Float](0).length == 1), "each prediction must be arity 1")
    assert(preds.forall(r => !r.getSeq[Float](0).head.isNaN))
  }

  test("SQL 3-arg ml_create restores saved weights from pure SQL (reference src/lib.rs:76-83)") {
    MlFunctions.registerAll(spark)
    val tmp = java.nio.file.Files.createTempDirectory("graft-sqlwp").toString
    MlFunctions.create(spark, "sqlwp", """{"layers":[{"in":2,"out":1}]}""")
    val m = ModelRegistry.get("sqlwp").get
    ModelRegistry.saveWeights(m, tmp)
    ModelRegistry.remove("sqlwp")
    val ok = spark.sql(s"SELECT ml_create('sqlwp', '', '$tmp') AS s").head().getString(0)
    assert(ok == "Ok")
    val restored = ModelRegistry.get("sqlwp").get
    assert(restored.predict(Array(1f, 2f)).sameElements(m.predict(Array(1f, 2f))))
    // 2-arg form still dispatches through the same registered name
    val ok2 = spark
      .sql("""SELECT ml_create('sqlwp2', '{"layers":[{"in":1,"out":1}]}') AS s""")
      .head()
      .getString(0)
    assert(ok2 == "Ok" && ModelRegistry.get("sqlwp2").isDefined)
  }

  test("saveWeights retains prior checkpoints; loadLatest picks the newest") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-hist").toString
    MlFunctions.create(spark, "hist_model", """{"layers":[{"in":1,"out":1}]}""")
    val m1 = ModelRegistry.get("hist_model").get
    val d1 = ModelRegistry.saveWeights(m1, tmp)
    // mutate and save again under a later timestamp
    val m2 = m1.copyOf()
    m2.layers.head.w(0) += 5f
    Thread.sleep(1100) // timestamp resolution is seconds
    val d2 = ModelRegistry.saveWeights(m2, tmp)
    assert(java.nio.file.Files.exists(d1.resolve("weights.json")), "history must be retained")
    assert(java.nio.file.Files.exists(d2.resolve("weights.json")))
    assert(d1 != d2)
    val loaded = ModelRegistry.loadLatest("hist_model", tmp).get
    assert(loaded.predict(Array(3f)).sameElements(m2.predict(Array(3f))), "newest wins")
  }

  test("trainDistributed propagates BatchNorm running stats (eval-mode inference works)") {
    val rng = new scala.util.Random(29)
    // feature scale deliberately far from N(0,1) so init running stats
    // (mean 0, var 1) produce garbage if not propagated
    val rows = (0 until 2000).map { _ =>
      val f = Seq.fill(3)(50f + 10f * rng.nextFloat())
      (f, Seq(0.02f * f(0) - 0.01f * f(1) + 0.005f * f(2)))
    }
    val df = rows.toDF("f", "t").repartition(4)
    MlFunctions.create(
      spark,
      "bn_dist",
      """{"layers":[{"in":3,"out":16,"activation":"relu","batch_norm":true},{"in":16,"out":1}]}""",
    )
    val out = MlFunctions.trainDistributed(
      df, "bn_dist", $"f", $"t",
      """{"epochs":150,"learning_rate":0.02,"seed":42}""",
      log = _ => (),
    )
    val mse = out
      .select(avg(pow(element_at($"prediction", 1) - element_at($"t", 1), 2)))
      .as[Double]
      .head()
    val bn = ModelRegistry.get("bn_dist").get.layers.head.bn.get
    assert(bn.runningMean.exists(m => math.abs(m) > 1.0),
      "running mean must reflect the (shifted) data, not init zeros")
    assert(mse < 0.05, s"eval-mode BN inference should fit after stats fold: mse=$mse")
  }

  test("ml_create with weightsPath restores saved weights (fixed 3-arg semantics)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-wp").toString
    MlFunctions.create(spark, "wp_model", """{"layers":[{"in":2,"out":1}]}""")
    val m = ModelRegistry.get("wp_model").get
    ModelRegistry.saveWeights(m, tmp)
    ModelRegistry.remove("wp_model")
    assert(MlFunctions.create(spark, "wp_model", "", weightsPath = Some(tmp)) == "Ok")
    val restored = ModelRegistry.get("wp_model").get
    assert(restored.predict(Array(1f, 2f)).sameElements(m.predict(Array(1f, 2f))))
  }

  test("trainDistributed: loss decreases, deterministic under fixed partitioning") {
    val rng = new scala.util.Random(13)
    val rows = (0 until 2000).map { _ =>
      val f = Seq.fill(3)(rng.nextFloat() * 2 - 1)
      (f, Seq(0.4f * f(0) - 0.2f * f(1) + 0.1f * f(2) + 0.05f))
    }
    val df = rows.toDF("f", "t").repartition(4)

    def run(name: String): (Array[Float], Double) = {
      MlFunctions.create(
        spark,
        name,
        """{"layers":[{"in":3,"out":16,"activation":"tanh"},{"in":16,"out":1}]}""",
      )
      val out = MlFunctions.trainDistributed(
        df, name, $"f", $"t",
        """{"epochs":200,"learning_rate":0.05,"seed":42}""",
        log = _ => (),
      )
      val mse = out
        .select(avg(pow(element_at($"prediction", 1) - element_at($"t", 1), 2)))
        .as[Double]
        .head()
      (graft.ml.ModelRegistry.get(name).get.layers.head.w.clone(), mse)
    }
    val (w1, mse1) = run("dist_model")
    val (w2, mse2) = run("dist_model") // re-created: same name → same seeded init
    assert(mse1 < 0.005, s"distributed full-batch Adam should fit a linear map: mse=$mse1")
    assert(mse1 == mse2, "same partitioning + seed must reproduce identical loss")
    assert(w1.sameElements(w2), "weights must be bit-identical across runs")
  }

  test("foldRunningStats: law of total variance — partition-correlated data folds exactly") {
    // two partitions with very different means but zero within-partition
    // variance: a plain weighted mean of variances would report var=0;
    // the E[x²] fold must recover the full between-partition spread
    val stats = Seq(
      (Array(0f), Array(0f), 100L), // all values = 0
      (Array(10f), Array(0f), 100L), // all values = 10
    )
    val (mean, variance) = MlFunctions.foldRunningStats(stats)
    assert(mean(0) == 5f, s"mean: ${mean(0)}")
    assert(variance(0) == 25f, s"global var must include mean spread: ${variance(0)}")
    // weighted general case: E[x²]−E[x]² against hand-computed values
    val (m2, v2) = MlFunctions.foldRunningStats(Seq(
      (Array(1f), Array(4f), 300L),
      (Array(3f), Array(1f), 100L),
    ))
    assert(math.abs(m2(0) - 1.5f) < 1e-6)
    // E[x²] = (300*(4+1) + 100*(1+9))/400 = 6.25; var = 6.25 − 2.25 = 4.0
    assert(math.abs(v2(0) - 4.0f) < 1e-6, s"var: ${v2(0)}")
  }

  test("trainSql: quotes in model name and config are data, not SQL") {
    MlFunctions.registerAll(spark)
    Seq((Seq(0.1f), Seq(0.2f)), (Seq(0.3f), Seq(0.4f)))
      .toDF("features", "targets")
      .createOrReplaceTempView("quoted_train")
    val name = "it's-a-model"
    MlFunctions.create(spark, name, """{"layers":[{"in":1,"out":1}]}""")
    val preds = MlFunctions.trainSql(
      spark, name, "quoted_train", "features", "targets",
      configJson = """{"epochs":1,"seed":42,"note":"don't break"}""",
    ).collect()
    assert(preds.length == 2)
    intercept[IllegalArgumentException] {
      MlFunctions.trainSql(spark, name, "quoted_train; DROP TABLE x", "features", "targets")
    }
  }

  test("ml_pred snapshot isolation: retraining does not change published plan until re-publish") {
    MlFunctions.create(spark, "snap", """{"layers":[{"in":1,"out":1}]}""")
    val df = Seq(Tuple1(Seq(2f))).toDF("f")
    val col1 = MlFunctions.predictCol(spark, "snap", $"f")
    val before = df.select(col1).head().getSeq[Float](0)
    // mutate registry directly (bypassing publish)
    val m = ModelRegistry.get("snap").get
    m.layers.head.w(0) += 10f
    ModelRegistry.put(m)
    val after = df.select(col1).head().getSeq[Float](0)
    assert(before == after, "captured snapshot must be immutable")
    val fresh = df.select(MlFunctions.predictCol(spark, "snap", $"f")).head().getSeq[Float](0)
    assert(fresh != before, "new predictCol must bind the updated weights")
  }
}
