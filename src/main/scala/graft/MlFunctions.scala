package graft

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.ml.{Mlp, ModelRegistry, TrainConfig, TrainStats}

/** The reference's 4-function SQL surface (`ml_create`, `ml_list`,
  * `ml_train`, `ml_pred` — reference src/lib.rs:240-252) re-expressed
  * Spark-first.
  *
  * Execution model: models are created/trained on the DRIVER (training
  * a single model with sequential Adam is inherently driver-side state,
  * mirroring the reference's in-process registry at src/nn/mod.rs:25);
  * inference runs distributed on executors against an immutable weight
  * snapshot shipped via [[org.apache.spark.broadcast.Broadcast]] at
  * publish time. Every registry mutation re-publishes, so a SQL
  * `ml_pred(...)` call always binds the snapshot current at the time
  * the query is planned — the distributed analog of the reference's
  * clone-out-of-registry semantics (src/nn/mod.rs:48-55).
  *
  * Semantic divergences from the reference (documented, intentional):
  *   - `ml_train` trains on the WHOLE input relation exactly once.
  *     The reference retrains per 2048-row DataChunk (src/lib.rs:147-171)
  *     which is an artifact of its vectorized-scalar packaging, not a
  *     meaningful semantic at Spark scale (SURVEY §2.1).
  *   - `ml_create(name, spec, weightsPath)` actually loads the weights
  *     (the reference's 3-arg branch is unreachable, src/lib.rs:50-60).
  *   - Ragged / wrong-width feature lists raise an error instead of the
  *     reference's silent mis-slicing (src/utils.rs:14-23).
  */
object MlFunctions {

  @volatile private var snapshotBc: Option[Broadcast[Map[String, Mlp]]] = None

  /** `ml_create(name, spec[, weightsPath]) → "Ok"`
    * (reference src/lib.rs:23-86).
    */
  def create(
      spark: SparkSession,
      name: String,
      specJson: String,
      weightsPath: Option[String] = None,
      seed: Long = 42L,
  ): String = {
    val model = weightsPath match {
      case Some(path) =>
        val loaded = ModelRegistry
          .loadLatest(name, path)
          .getOrElse(throw new IllegalArgumentException(s"no saved weights for '$name' under $path"))
        require(loaded.specJson != null, "loaded weights missing spec")
        loaded
      case None => Mlp.fromSpec(name, specJson, seed)
    }
    ModelRegistry.put(model)
    publish(spark)
    "Ok"
  }

  /** `ml_list() → TABLE(model VARCHAR, json VARCHAR)` (reference
    * src/lib.rs:88-126). Driver-local registry snapshot → DataFrame; no
    * custom scan protocol needed on Spark.
    */
  def list(spark: SparkSession): DataFrame = {
    import spark.implicits._
    ModelRegistry.list().toDF("model", "json")
  }

  /** `ml_train`: train `name` on the whole input relation, then return
    * the input with a `prediction` column computed from the freshly
    * trained weights in eval mode (return-predictions contract per
    * reference src/lib.rs:175-176, eval mode per src/nn/mod.rs:71).
    *
    * @param orderBy     deterministic collect order (reference training
    *                    is deterministic given seed + row order,
    *                    src/nn/train.rs:56,73-76; Spark partition order
    *                    is not — pass explicit sort keys to reproduce).
    * @param trainFraction 0.3 reproduces the reference's observed
    *                    first-30%-train split (src/nn/mod.rs:104-109);
    *                    1.0 trains on everything.
    *
    * Scale note: `collect()` of the feature matrix to the driver bounds
    * the trainable set by driver memory (same bound as the reference's
    * in-process design). For 100 TB inputs the intended pattern is to
    * train on a sample (`df.sample(...)`) or aggregate minibatch
    * gradients distributedly — see [[trainSampled]].
    */
  def train(
      df: DataFrame,
      name: String,
      features: Column,
      targets: Column,
      configJson: String = "",
      orderBy: Seq[Column] = Nil,
      trainFraction: Double = 0.3,
      log: String => Unit = m => Console.err.println(m),
  ): DataFrame = {
    val spark = df.sparkSession
    val cfg = TrainConfig.parse(configJson)
    val ordered = if (orderBy.nonEmpty) df.orderBy(orderBy: _*) else df
    val rows = ordered
      .select(
        features.cast(ArrayType(FloatType)).as("f"),
        targets.cast(ArrayType(FloatType)).as("t"),
      )
      .collect()
    val feats = rows.map(r => seqToFloats(r.getSeq[Float](0), "features"))
    val tgts = rows.map(r => seqToFloats(r.getSeq[Float](1), "targets"))

    val model = ModelRegistry
      .get(name)
      .getOrElse(throw new IllegalArgumentException(s"model '$name' not found — ml_create first"))
    lastStats = Some(model.fit(feats, tgts, cfg, trainFraction, log))
    ModelRegistry.put(model)
    ModelRegistry.saveWeights(model)
    publish(spark)
    df.withColumn("prediction", predictCol(spark, name, features))
  }

  /** Scale path for huge inputs: train on a bounded deterministic
    * sample instead of the full relation. Sample fraction chosen so at
    * most `maxRows` reach the driver.
    */
  def trainSampled(
      df: DataFrame,
      name: String,
      features: Column,
      targets: Column,
      configJson: String = "",
      maxRows: Long = 1000000L,
      seed: Long = 42L,
      trainFraction: Double = 1.0,
  ): DataFrame = {
    val n = df.count()
    val sampled =
      if (n <= maxRows) df
      else df.sample(withReplacement = false, maxRows.toDouble / n, seed)
    // fit on the bounded sample; predictions over the FULL relation
    train(sampled, name, features, targets, configJson, orderBy = Nil,
      trainFraction = trainFraction, log = _ => ())
    df.withColumn("prediction", predictCol(df.sparkSession, name, features))
  }

  /** Prediction column bound to the CURRENT snapshot of `name`'s
    * weights (broadcast). Codegen-friendly scalar path; stays inside
    * whole-stage codegen as a deterministic Scala UDF.
    */
  def predictCol(spark: SparkSession, name: String, features: Column): Column = {
    val model = ModelRegistry
      .get(name)
      .getOrElse(throw new IllegalArgumentException(s"model '$name' not found"))
    val bc = spark.sparkContext.broadcast(model)
    val fn = udf { (feats: Seq[Float]) =>
      if (feats == null) null
      else bc.value.predict(seqToFloats(feats, "features"))
    }
    fn(features.cast(ArrayType(FloatType)))
  }

  /** Re-broadcast the registry and (re)bind the SQL UDF surface to the
    * fresh snapshot. Called automatically by create/train.
    */
  def publish(spark: SparkSession): Unit = synchronized {
    snapshotBc.foreach(_.unpersist(blocking = false))
    val bc = spark.sparkContext.broadcast(ModelRegistry.snapshot())
    snapshotBc = Some(bc)
    spark.udf.register("ml_pred", predUdf(bc))
    list(spark).createOrReplaceTempView("ml_models")
  }

  private def predUdf(bc: Broadcast[Map[String, Mlp]]): UserDefinedFunction =
    udf { (name: String, feats: Seq[Float]) =>
      val model = bc.value.getOrElse(
        name,
        throw new IllegalArgumentException(s"ml_pred: model '$name' not found"),
      )
      if (feats == null) null
      else model.predict(seqToFloats(feats, "features"))
    }

  /** Register the SQL-compat surface on a fresh session:
    *   - `ml_pred(name, feats)` — distributed, broadcast-bound.
    *   - `ml_create(name, spec)` — registered for sqllogictest-mirror
    *     compat; the UDF body runs on an executor thread, which only
    *     aliases the driver registry in local mode. Cluster code should
    *     call [[create]]. Marked nondeterministic so Catalyst cannot
    *     collapse/reorder/re-execute it (SURVEY §4).
    *   - view `ml_models` — `ml_list()` equivalent.
    */
  def registerAll(spark: SparkSession): Unit = {
    val createFn = udf { (name: String, spec: String) =>
      ModelRegistry.put(Mlp.fromSpec(name, spec))
      "Ok"
    }.asNondeterministic()
    spark.udf.register("ml_create", createFn)
    publish(spark)
  }

  private def seqToFloats(s: Seq[Float], what: String): Array[Float] = {
    val a = new Array[Float](s.length)
    var i = 0
    val it = s.iterator
    while (it.hasNext) {
      val v = it.next()
      a(i) = v
      i += 1
    }
    a
  }

  /** Expose last train stats for tests. */
  @volatile var lastStats: Option[TrainStats] = None
}
