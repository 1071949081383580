package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ml._

class MlpSpec extends AnyFunSuite {

  private val spec5_16_1 =
    """{"layers":[{"in":5,"out":16,"activation":"relu"},{"in":16,"out":1}]}"""

  test("spec parse: basic shape, defaults") {
    val s = NetworkSpec.parse(spec5_16_1)
    assert(s.layers.length == 2)
    assert(s.inputDim == 5 && s.outputDim == 1)
    assert(s.layers.head.activationKind == Activation.Relu)
    assert(!s.layers.head.batchNorm && s.layers.head.dropout == 0.0f)
  }

  test("spec parse: unknown activation silently ignored (reference src/nn/model.rs:127-133)") {
    val s = NetworkSpec.parse(
      """{"layers":[{"in":2,"out":2,"activation":"gelu"}]}""",
    )
    assert(s.layers.head.activationKind == Activation.Identity)
  }

  test("spec parse: rejects missing layers / bad fields") {
    assertThrows[IllegalArgumentException](NetworkSpec.parse("""{"nope":1}"""))
    assertThrows[IllegalArgumentException](NetworkSpec.parse("""{"layers":[]}"""))
    assertThrows[IllegalArgumentException](NetworkSpec.parse("""{"layers":[{"in":2}]}"""))
    assertThrows[IllegalArgumentException](NetworkSpec.parse("not json"))
  }

  test("train config: reference defaults (src/nn/train.rs:20-30) and overrides") {
    val d = TrainConfig.parse("")
    assert(d == TrainConfig(10, 64, 42L, 0.01f))
    val c = TrainConfig.parse("""{"epochs":100,"learning_rate":3e-4,"batch_size":32,"seed":7}""")
    assert(c.epochs == 100 && c.batchSize == 32 && c.seed == 7L)
    assert(math.abs(c.learningRate - 3e-4f) < 1e-9)
  }

  test("forward: output shape and width validation") {
    val m = Mlp.fromSpec("shape", spec5_16_1)
    val y = m.predict(Array(1f, 2f, 3f, 4f, 5f))
    assert(y.length == 1)
    assertThrows[IllegalArgumentException](m.predict(Array(1f, 2f)))
  }

  test("training reduces loss on a learnable function (whole-input split)") {
    val rng = new scala.util.Random(0)
    val n = 256
    val feats = Array.fill(n)(Array.fill(3)(rng.nextFloat() * 2 - 1))
    val tgts = feats.map(f => Array(0.5f * f(0) - 0.3f * f(1) + 0.2f * f(2) + 0.1f))
    val spec = """{"layers":[{"in":3,"out":16,"activation":"relu"},{"in":16,"out":1}]}"""
    val m = Mlp.fromSpec("learn", spec)
    val stats = m.fit(
      feats,
      tgts,
      TrainConfig(epochs = 50, batchSize = 32, seed = 42L, learningRate = 0.01f),
      trainFraction = 1.0,
    )
    assert(stats.epochTrainMse.last < stats.epochTrainMse.head / 5,
      s"loss did not decrease: ${stats.epochTrainMse.head} -> ${stats.epochTrainMse.last}")
    assert(stats.epochTrainMse.last < 0.01)
  }

  test("determinism: same seed + order → identical weights and predictions") {
    def trained(): Mlp = {
      val rng = new scala.util.Random(1)
      val feats = Array.fill(100)(Array.fill(4)(rng.nextFloat()))
      val tgts = feats.map(f => Array(f.sum))
      val m = Mlp.fromSpec(
        "det",
        """{"layers":[{"in":4,"out":8,"activation":"tanh"},{"in":8,"out":1}]}""",
      )
      m.fit(feats, tgts, TrainConfig(epochs = 5), trainFraction = 1.0)
      m
    }
    val a = trained()
    val b = trained()
    val x = Array(0.1f, 0.2f, 0.3f, 0.4f)
    assert(a.predict(x).sameElements(b.predict(x)))
    assert(a.layers.head.w.sameElements(b.layers.head.w))
  }

  test("observed split quirk: first 30% trains (reference src/nn/mod.rs:104-109)") {
    val feats = Array.fill(10)(Array(1f))
    val tgts = Array.fill(10)(Array(1f))
    val m = Mlp.fromSpec("split", """{"layers":[{"in":1,"out":1}]}""")
    val stats = m.fit(feats, tgts, TrainConfig(epochs = 1))
    assert(stats.trainRows == 3 && stats.testRows == 7)
  }

  test("1-sample input: empty train split does not crash (reference functions.test:10)") {
    val m = Mlp.fromSpec("one", """{"layers":[{"in":2,"out":8,"activation":"relu"},{"in":8,"out":1}]}""")
    val stats = m.fit(Array(Array(0f, 0f)), Array(Array(0f)), TrainConfig(epochs = 2))
    assert(stats.trainRows == 0 && stats.testRows == 1)
    assert(m.predict(Array(0f, 0f)).length == 1)
  }

  test("batchnorm + dropout: trains, eval mode deterministic") {
    val rng = new scala.util.Random(3)
    val feats = Array.fill(200)(Array.fill(4)(rng.nextFloat() * 4 - 2))
    val tgts = feats.map(f => Array(f(0) * f(0) + f(1)))
    val spec =
      """{"layers":[
        |{"in":4,"out":32,"activation":"relu","batch_norm":true,"dropout":0.1},
        |{"in":32,"out":1}]}""".stripMargin
    val m = Mlp.fromSpec("bn", spec)
    val stats = m.fit(
      feats, tgts,
      TrainConfig(epochs = 30, batchSize = 32, learningRate = 0.005f),
      trainFraction = 1.0)
    assert(stats.epochTrainMse.last < stats.epochTrainMse.head,
      s"bn net did not learn: ${stats.epochTrainMse.toSeq}")
    val x = Array(0.5f, -0.5f, 1f, 0f)
    assert(m.predict(x).sameElements(m.predict(x)), "eval-mode predict must be deterministic")
  }

  test("save/load roundtrip preserves predictions (JSON weights)") {
    val m = Mlp.fromSpec("rt", spec5_16_1)
    val rng = new scala.util.Random(5)
    val feats = Array.fill(50)(Array.fill(5)(rng.nextFloat()))
    val tgts = feats.map(f => Array(f.sum / 5))
    m.fit(feats, tgts, TrainConfig(epochs = 3), trainFraction = 1.0)
    val json = ModelRegistry.toJson(m)
    val m2 = ModelRegistry.fromJson(json)
    val x = Array(0.1f, 0.9f, 0.3f, 0.7f, 0.5f)
    assert(m.predict(x).sameElements(m2.predict(x)))
  }

  test("registry: clone-out get, put-replace, sorted list") {
    ModelRegistry.clear()
    ModelRegistry.put(Mlp.fromSpec("b_model", spec5_16_1))
    ModelRegistry.put(Mlp.fromSpec("a_model", spec5_16_1))
    val got = ModelRegistry.get("a_model").get
    got.layers.head.w(0) = 999f // mutating the clone must not affect the registry
    assert(ModelRegistry.get("a_model").get.layers.head.w(0) != 999f)
    assert(ModelRegistry.list().map(_._1) == Seq("a_model", "b_model"))
    ModelRegistry.clear()
  }

  test("weights save to models/<name>/<ts>/ and loadLatest restores (path contract src/nn/mod.rs:112-117)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-models").toString
    val m = Mlp.fromSpec("saveme", spec5_16_1)
    val dir = ModelRegistry.saveWeights(m, tmp)
    assert(dir.toString.matches(s".*saveme.\\d{8}_\\d{6}$$"), dir.toString)
    assert(java.nio.file.Files.exists(dir.resolve("config.json")))
    val loaded = ModelRegistry.loadLatest("saveme", tmp).get
    val x = Array(1f, 2f, 3f, 4f, 5f)
    assert(loaded.predict(x).sameElements(m.predict(x)))
  }
}
