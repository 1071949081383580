package graft.ml

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._

/** One fully-connected layer of the network spec.
  *
  * Mirrors the reference's `LayerSpec` serde struct
  * (reference: src/nn/model.rs:12-20): keys `in`, `out`, optional
  * `activation`, optional `batch_norm` (default false), optional
  * `dropout` (default 0.0).
  */
final case class LayerSpec(
    in: Int,
    out: Int,
    activation: Option[String],
    batchNorm: Boolean,
    dropout: Float,
) {
  /** Resolved activation. Unknown activation names are silently ignored
    * (identity), matching reference src/nn/model.rs:127-133 — only
    * "relu" and "tanh" act.
    */
  def activationKind: Activation = activation match {
    case Some("relu") => Activation.Relu
    case Some("tanh") => Activation.Tanh
    case _            => Activation.Identity
  }
}

sealed abstract class Activation
object Activation {
  case object Identity extends Activation
  case object Relu extends Activation
  case object Tanh extends Activation
}

/** Network spec: `{"layers":[{"in":N,"out":M,...}, ...]}`
  * (reference: src/nn/model.rs:22-26).
  */
final case class NetworkSpec(layers: Vector[LayerSpec]) {
  /** First layer input width. Reference's `input_dim` is buggy (returns
    * num_dims, src/nn/model.rs:138-152); we implement the intended
    * semantics for input validation.
    */
  def inputDim: Int = layers.head.in
  def outputDim: Int = layers.last.out
}

object NetworkSpec {
  private val mapper = new ObjectMapper()

  /** Parse a spec JSON string. Throws IllegalArgumentException on
    * missing/invalid structure (reference surfaces serde errors as SQL
    * errors, src/lib.rs:38-44).
    */
  def parse(json: String): NetworkSpec = {
    val root =
      try mapper.readTree(json)
      catch {
        case e: Exception =>
          throw new IllegalArgumentException(s"invalid network spec JSON: ${e.getMessage}")
      }
    val layersNode = root.get("layers")
    if (layersNode == null || !layersNode.isArray)
      throw new IllegalArgumentException("network spec must have a \"layers\" array")
    val layers = layersNode.elements().asScala.map { n =>
      val in = reqInt(n, "in")
      val out = reqInt(n, "out")
      val act = Option(n.get("activation")).filter(_.isTextual).map(_.asText())
      val bn = Option(n.get("batch_norm")).exists(_.asBoolean(false))
      val drop = Option(n.get("dropout")).map(_.floatValue()).getOrElse(0.0f)
      LayerSpec(in, out, act, bn, drop)
    }.toVector
    if (layers.isEmpty)
      throw new IllegalArgumentException("network spec needs at least one layer")
    NetworkSpec(layers)
  }

  private def reqInt(n: JsonNode, key: String): Int = {
    val v = n.get(key)
    if (v == null || !v.canConvertToInt)
      throw new IllegalArgumentException(s"layer spec missing integer \"$key\"")
    v.intValue()
  }
}

/** Training hyper-parameters with the reference defaults
  * (reference: src/nn/train.rs:20-30): epochs=10, batch_size=64,
  * seed=42, learning_rate=0.01.
  */
final case class TrainConfig(
    epochs: Int = 10,
    batchSize: Int = 64,
    seed: Long = 42L,
    learningRate: Float = 0.01f,
)

object TrainConfig {
  private val mapper = new ObjectMapper()

  /** Parse the optional 4th `ml_train` argument (reference:
    * src/lib.rs:152-162). Null/empty → defaults. Unknown keys ignored.
    */
  def parse(json: String): TrainConfig = {
    if (json == null || json.trim.isEmpty) return TrainConfig()
    val root =
      try mapper.readTree(json)
      catch {
        case e: Exception =>
          throw new IllegalArgumentException(s"invalid train config JSON: ${e.getMessage}")
      }
    TrainConfig(
      epochs = Option(root.get("epochs")).map(_.intValue()).getOrElse(10),
      batchSize = Option(root.get("batch_size")).map(_.intValue()).getOrElse(64),
      seed = Option(root.get("seed")).map(_.longValue()).getOrElse(42L),
      learningRate = Option(root.get("learning_rate")).map(_.floatValue()).getOrElse(0.01f),
    )
  }
}
