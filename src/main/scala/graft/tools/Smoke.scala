package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.MlFunctions

/** End-to-end smoke drive of the ML surface through Spark SQL — the
  * Scala mirror of the reference's sqllogictest flow
  * (test/sql/autompg.test:1-23): create → list → train → predict.
  * Run: `sbt "runMain graft.tools.Smoke [sfDir]"`.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession
      .builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-smoke")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    MlFunctions.registerAll(spark)

    // ml_create via SQL (reference test/sql/autompg.test:4)
    val created = spark
      .sql(
        """SELECT ml_create('mpg_model',
          |'{"layers":[{"in":3,"out":16,"activation":"relu"},{"in":16,"out":1}]}')
          |AS status""".stripMargin,
      )
      .collect()
      .head
      .getString(0)
    println(s"ml_create → $created")
    MlFunctions.publish(spark) // refresh snapshot after SQL-side create

    // ml_list mirror (reference test/sql/autompg.test:7-10)
    spark.sql("SELECT * FROM ml_models").show(truncate = false)

    // train on lineitem-derived regression: predict extendedprice/10000
    // from (quantity, discount, tax)
    val li = spark.read
      .parquet(s"$sfDir/lineitem.parquet")
      .select(
        array(
          col("l_quantity").cast("float"),
          col("l_discount").cast("float"),
          col("l_tax").cast("float"),
        ).as("features"),
        array((col("l_extendedprice") / 10000.0).cast("float")).as("targets"),
        col("l_orderkey"),
        col("l_linenumber"),
      )
    val trained = MlFunctions.train(
      li,
      "mpg_model",
      col("features"),
      col("targets"),
      """{"epochs":5,"batch_size":64,"seed":42}""",
      orderBy = Seq(col("l_orderkey"), col("l_linenumber")),
      trainFraction = 1.0,
    )
    trained.select("features", "targets", "prediction").show(5, truncate = false)

    // SQL-surface whole-relation training (reference test/sql/autompg.test:16
    // form): aggregate ml_train over the relation, then predict
    li.createOrReplaceTempView("li_feats")
    val sqlTrainStatus = spark
      .sql("""SELECT ml_train_cfg('mpg_model', features, targets,
             |'{"epochs":2,"batch_size":128}') AS s FROM li_feats""".stripMargin)
      .head()
      .getString(0)
    println(s"SQL ml_train → $sqlTrainStatus")
    MlFunctions.publish(spark)

    // ml_pred via SQL over a fresh view (reference test/sql/autompg.test:19)
    val preds = spark.sql(
      "SELECT ml_pred('mpg_model', features) AS yhat FROM li_feats",
    )
    preds.show(5, truncate = false)
    val n = preds.where(col("yhat").isNotNull && size(col("yhat")) === 1).count()
    println(s"rows with arity-1 prediction: $n")
    val mse = trained
      .select(avg(pow(element_at(col("prediction"), 1) - element_at(col("targets"), 1), 2)))
      .as[Double]
      .collect()
      .head
    println(f"full-relation train MSE: $mse%.6f")

    // trainSql: the reference's per-row ml_train return shape — one
    // prediction list per input row out of a pure-SQL flow
    val sqlPreds = MlFunctions
      .trainSql(spark, "mpg_model", "li_feats", "features", "targets",
        configJson = """{"epochs":1,"batch_size":256}""")
      .where(size(col("prediction")) === 1)
      .count()
    println(s"trainSql per-row predictions: $sqlPreds")

    // pipeline-operator sweep over documents (the q31-q34 surface)
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val redacted = graft.operators.TextAnalysis.redactPii(docs, "text").where(col("pii_found")).count()
    val chunks = graft.operators.TextAnalysis.chunkTokens(docs, "doc_id", "text", 64, 48).count()
    val sampled = graft.operators.TextAnalysis.contentSample(docs, "text").count()
    val langs = graft.operators.TextAnalysis.corpusStats(docs, "text", Seq("lang")).count()
    println(s"pipeline sweep: pii_rows=$redacted chunks=$chunks sampled=$sampled lang_groups=$langs")
    spark.stop()
  }
}
