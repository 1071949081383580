package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.MlFunctions

/** FastText-style distilled quality classifier — the curation pattern
  * where slow or partial quality labels (human ratings, an expensive
  * model, a heuristic run on a sample) are distilled into a tiny
  * model that scores the WHOLE corpus as a shuffle-free map:
  *
  *   1. featurize: hashed bag of word {1,2}-grams → `dim` floats
  *      (native codegen expression, one tokenize pass, L2-normalized)
  *   2. train: the library's MLP (reservoir-sampled scale path — no
  *      count pre-pass, driver holds ≤ `maxSampleRows` rows) with an
  *      identity regression head distilled to the 0/1 label
  *   3. score: per-row codegen predict, output clamped to [0, 1]
  *
  * Scale shape: training touches one bounded sample scan; scoring is
  * a pure per-row map (featurize + dense forward pass) with no
  * shuffle, no join, no driver round-trip — the 100 TB corpus pass is
  * embarrassingly parallel.
  */
object QualityClassifier {

  /** The featurization both train and score share. */
  def features(text: Column, dim: Int): Column =
    graft.functions.TextSignatures.hashedNgramFeatures(text, dim)

  /** Train `modelName` to predict `labelCol` (0/1 or a [0,1] score)
    * from hashed n-gram features of `textCol`. Returns training-set
    * predictions (the `ml_train` contract).
    */
  def train(
      df: DataFrame,
      textCol: String,
      labelCol: String,
      modelName: String,
      dim: Int = 256,
      hidden: Int = 32,
      maxSampleRows: Long = 1000000L,
      configJson: String = "",
      seed: Long = 42L,
  ): DataFrame = {
    val spec =
      s"""{"layers":[{"in":$dim,"out":$hidden,"activation":"relu"},{"in":$hidden,"out":1}]}"""
    MlFunctions.create(df.sparkSession, modelName, spec, seed = seed)
    MlFunctions.trainSampled(
      df,
      modelName,
      features(col(textCol), dim),
      array(col(labelCol).cast("float")),
      configJson = configJson,
      maxRows = maxSampleRows,
      seed = seed,
    )
  }

  /** Score every row with the trained classifier: adds `outCol` =
    * clamp(prediction, 0, 1). `dim` must match training.
    */
  def score(
      df: DataFrame,
      textCol: String,
      modelName: String,
      dim: Int = 256,
      outCol: String = "quality_prob",
  ): DataFrame = {
    val pred = element_at(
      MlFunctions.predictCol(df.sparkSession, modelName, features(col(textCol), dim)),
      1,
    )
    df.withColumn(outCol, least(greatest(pred.cast("double"), lit(0.0)), lit(1.0)))
  }
}
