package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.{Activation, Mlp, NetworkSpec, TrainConfig}

/** ScalaCheck-generator properties for the spec/config codecs and
  * forward pass (SURVEY §5 rebuild test plan). Sampled manually
  * (the scalatest-scalacheck bridge isn't on the offline classpath).
  */
class SpecPropertiesSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 100): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val layerGen = for {
    in <- Gen.choose(1, 16)
    out <- Gen.choose(1, 16)
    act <- Gen.option(Gen.oneOf("relu", "tanh", "gelu", "swish", "bogus"))
    bn <- Gen.oneOf(true, false)
    drop <- Gen.choose(0.0f, 0.9f)
  } yield (in, out, act, bn, drop)

  test("property: any generated spec JSON parses; unknown activations are identity") {
    samples(Gen.nonEmptyListOf(layerGen)).foreach { layers =>
      val json = layers
        .map { case (in, out, act, bn, drop) =>
          val actJson = act.map(a => s""","activation":"$a"""").getOrElse("")
          s"""{"in":$in,"out":$out$actJson,"batch_norm":$bn,"dropout":$drop}"""
        }
        .mkString("""{"layers":[""", ",", "]}")
      val spec = NetworkSpec.parse(json)
      assert(spec.layers.length == layers.length)
      spec.layers.zip(layers).foreach { case (parsed, (in, out, act, bn, drop)) =>
        assert(parsed.in == in && parsed.out == out)
        assert(parsed.batchNorm == bn)
        assert(math.abs(parsed.dropout - drop) < 1e-6)
        val expected = act match {
          case Some("relu") => Activation.Relu
          case Some("tanh") => Activation.Tanh
          case _            => Activation.Identity
        }
        assert(parsed.activationKind == expected)
      }
    }
  }

  test("property: forward output finite and correctly shaped for any chained spec") {
    val chainGen = for {
      dims <- Gen.nonEmptyListOf(Gen.choose(1, 8)).map(ds => 3 :: ds)
      acts <- Gen.listOfN(dims.length - 1, Gen.oneOf("relu", "tanh", "none"))
    } yield dims.sliding(2).toList.collect { case List(i, o) => (i, o) }.zip(acts)
    samples(chainGen).foreach { layers =>
      val json = layers
        .map { case ((i, o), a) => s"""{"in":$i,"out":$o,"activation":"$a"}""" }
        .mkString("""{"layers":[""", ",", "]}")
      val m = Mlp.fromSpec("prop", json)
      val y = m.predict(Array(0.5f, -0.5f, 1.0f))
      assert(y.length == layers.last._1._2)
      assert(y.forall(v => !v.isNaN && !v.isInfinite))
    }
  }

  test("property: train config roundtrips arbitrary positive values") {
    val g = for {
      e <- Gen.choose(1, 500)
      b <- Gen.choose(1, 512)
      s <- Gen.choose(0L, 10000L)
    } yield (e, b, s)
    samples(g).foreach { case (epochs, batch, seed) =>
      val cfg = TrainConfig.parse(s"""{"epochs":$epochs,"batch_size":$batch,"seed":$seed}""")
      assert(cfg == TrainConfig(epochs, batch, seed, 0.01f))
    }
  }
}
