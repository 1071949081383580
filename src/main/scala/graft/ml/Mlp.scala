package graft.ml

import scala.util.Random

/** BatchNorm parameters + running statistics for one layer's output
  * width (reference: Burn BatchNorm wired per-layer at
  * src/nn/model.rs:80-88, applied at src/nn/model.rs:117-119).
  *
  * Train mode normalizes with batch statistics and updates the running
  * estimates; eval mode normalizes with the running estimates
  * (standard BatchNorm1d semantics, momentum 0.1, eps 1e-5).
  */
final class BatchNormParams(val dim: Int) extends Serializable {
  val gamma: Array[Float] = Array.fill(dim)(1.0f)
  val beta: Array[Float] = new Array[Float](dim)
  val runningMean: Array[Float] = new Array[Float](dim)
  val runningVar: Array[Float] = Array.fill(dim)(1.0f)
  val momentum: Float = 0.1f
  val eps: Float = 1e-5f

  def copyOf(): BatchNormParams = {
    val c = new BatchNormParams(dim)
    System.arraycopy(gamma, 0, c.gamma, 0, dim)
    System.arraycopy(beta, 0, c.beta, 0, dim)
    System.arraycopy(runningMean, 0, c.runningMean, 0, dim)
    System.arraycopy(runningVar, 0, c.runningVar, 0, dim)
    c
  }
}

/** One dense layer: Linear → BatchNorm? → Dropout? → activation?
  * (pipeline order per reference src/nn/model.rs:110-136).
  *
  * Weights are row-major `w(i*out + o)`, f32 like the reference's
  * NdArray<f32> backend (src/nn/mod.rs:23).
  */
final class DenseLayer(
    val in: Int,
    val out: Int,
    val w: Array[Float],
    val b: Array[Float],
    val activation: Activation,
    val bn: Option[BatchNormParams],
    val dropout: Float,
) extends Serializable {
  def copyOf(): DenseLayer =
    new DenseLayer(in, out, w.clone(), b.clone(), activation, bn.map(_.copyOf()), dropout)
}

/** Per-layer forward cache used by backprop. */
private[ml] final class LayerTape(
    val x: Array[Float], // layer input, B×in
    val z: Array[Float], // linear output, B×out
    var xhat: Array[Float] = null, // bn-normalized z
    var invStd: Array[Float] = null, // 1/sqrt(var+eps) per feature
    var dropMask: Array[Float] = null, // inverted-dropout multiplier per element
    val postDrop: Array[Float], // activation input, B×out
    val y: Array[Float], // layer output, B×out
)

/** Adam state for one parameter tensor (β1=0.9, β2=0.999 — Burn's
  * AdamConfig defaults, reference src/nn/train.rs:80).
  */
private[ml] final class AdamState(n: Int) {
  val m: Array[Float] = new Array[Float](n)
  val v: Array[Float] = new Array[Float](n)
}

final case class TrainStats(
    epochTrainMse: Array[Double],
    epochTestMse: Array[Double],
    trainRows: Int,
    testRows: Int,
)

/** A sequential fully-connected network with MSE + Adam training.
  *
  * Re-implements the reference's Burn-based model (src/nn/model.rs) and
  * training loop (src/nn/train.rs) in dependency-free Scala so it can
  * run on the Spark driver and be broadcast to executors for inference.
  * Deterministic given (initSeed, cfg.seed, input row order).
  */
final class Mlp(
    val name: String,
    val specJson: String,
    val spec: NetworkSpec,
    val layers: Array[DenseLayer],
) extends Serializable {

  def inputDim: Int = spec.inputDim
  def outputDim: Int = spec.outputDim

  def copyOf(): Mlp = new Mlp(name, specJson, spec, layers.map(_.copyOf()))

  // ---------------------------------------------------------------- forward

  /** Eval-mode forward for a single row (dropout off, BN running stats)
    * — the `ml_pred` hot path (reference eval mode: src/nn/mod.rs:71,
    * model.valid() drops autodiff so dropout is inactive).
    */
  def predict(x: Array[Float]): Array[Float] = {
    require(
      x.length == inputDim,
      s"model '$name' expects $inputDim features, got ${x.length}",
    )
    var cur = x
    var li = 0
    while (li < layers.length) {
      val l = layers(li)
      val outArr = new Array[Float](l.out)
      var o = 0
      while (o < l.out) {
        var acc = l.b(o)
        var i = 0
        while (i < l.in) {
          acc += cur(i) * l.w(i * l.out + o)
          i += 1
        }
        outArr(o) = acc
        o += 1
      }
      l.bn.foreach { bn =>
        var o2 = 0
        while (o2 < l.out) {
          val inv = (1.0 / math.sqrt(bn.runningVar(o2) + bn.eps)).toFloat
          outArr(o2) = bn.gamma(o2) * ((outArr(o2) - bn.runningMean(o2)) * inv) + bn.beta(o2)
          o2 += 1
        }
      }
      applyActivationInPlace(l.activation, outArr)
      cur = outArr
      li += 1
    }
    cur
  }

  /** Eval-mode batch forward. rows×inputDim flat input. */
  def predictBatch(xs: Array[Array[Float]]): Array[Array[Float]] = xs.map(predict)

  private def applyActivationInPlace(act: Activation, a: Array[Float]): Unit = act match {
    case Activation.Relu =>
      var i = 0
      while (i < a.length) { if (a(i) < 0f) a(i) = 0f; i += 1 }
    case Activation.Tanh =>
      var i = 0
      while (i < a.length) { a(i) = math.tanh(a(i)).toFloat; i += 1 }
    case Activation.Identity => ()
  }

  /** Training-mode forward over a flat batch, recording tapes. */
  private def forwardTrain(x: Array[Float], rows: Int, rng: Random): Array[LayerTape] = {
    val tapes = new Array[LayerTape](layers.length)
    var cur = x
    var li = 0
    while (li < layers.length) {
      val l = layers(li)
      val z = new Array[Float](rows * l.out)
      // Linear: z = cur·W + b
      var r = 0
      while (r < rows) {
        val xOff = r * l.in
        val zOff = r * l.out
        var o = 0
        while (o < l.out) { z(zOff + o) = l.b(o); o += 1 }
        var i = 0
        while (i < l.in) {
          val xv = cur(xOff + i)
          if (xv != 0f) {
            val wOff = i * l.out
            var o2 = 0
            while (o2 < l.out) { z(zOff + o2) += xv * l.w(wOff + o2); o2 += 1 }
          }
          i += 1
        }
        r += 1
      }
      // BatchNorm (train mode: batch stats; update running stats)
      var afterBn = z
      var xhat: Array[Float] = null
      var invStd: Array[Float] = null
      l.bn.foreach { bn =>
        xhat = new Array[Float](rows * l.out)
        invStd = new Array[Float](l.out)
        afterBn = new Array[Float](rows * l.out)
        var o = 0
        while (o < l.out) {
          var sum = 0.0
          var r2 = 0
          while (r2 < rows) { sum += z(r2 * l.out + o); r2 += 1 }
          val mean = (sum / rows).toFloat
          var sq = 0.0
          r2 = 0
          while (r2 < rows) {
            val d = z(r2 * l.out + o) - mean
            sq += d * d
            r2 += 1
          }
          val varB = (sq / rows).toFloat // biased batch variance
          val inv = (1.0 / math.sqrt(varB + bn.eps)).toFloat
          invStd(o) = inv
          r2 = 0
          while (r2 < rows) {
            val xh = (z(r2 * l.out + o) - mean) * inv
            xhat(r2 * l.out + o) = xh
            afterBn(r2 * l.out + o) = bn.gamma(o) * xh + bn.beta(o)
            r2 += 1
          }
          // running stats use the unbiased variance (torch/Burn convention)
          val varUnbiased = if (rows > 1) varB * rows / (rows - 1).toFloat else varB
          bn.runningMean(o) = (1 - bn.momentum) * bn.runningMean(o) + bn.momentum * mean
          bn.runningVar(o) = (1 - bn.momentum) * bn.runningVar(o) + bn.momentum * varUnbiased
          o += 1
        }
        ()
      }
      // Dropout (train mode, inverted scaling)
      var afterDrop = afterBn
      var dropMask: Array[Float] = null
      if (l.dropout > 0f) {
        val keep = 1.0f - l.dropout
        dropMask = new Array[Float](rows * l.out)
        afterDrop = new Array[Float](rows * l.out)
        var i = 0
        while (i < dropMask.length) {
          val m = if (rng.nextFloat() < keep) 1.0f / keep else 0.0f
          dropMask(i) = m
          afterDrop(i) = afterBn(i) * m
          i += 1
        }
      }
      // Activation
      val y =
        if (l.activation == Activation.Identity && (afterDrop ne z)) afterDrop
        else {
          val c = afterDrop.clone()
          applyActivationInPlace(l.activation, c)
          c
        }
      val fullTape = new LayerTape(cur, z, xhat, invStd, dropMask, afterDrop, y)
      tapes(li) = fullTape
      cur = y
      li += 1
    }
    tapes
  }

  // --------------------------------------------------------------- training

  /** Train with MSE loss + Adam, reproducing the reference loop
    * (src/nn/train.rs:39-135): seeded RNG, per-epoch shuffled
    * minibatches over the TRAIN split, per-epoch train/test MSE.
    *
    * Split compat: the reference keeps the FIRST 30% as train and the
    * rest as test (observed at src/nn/mod.rs:104-109 — the comment
    * claims the inverse; we reproduce the code's behavior by default).
    * Set `trainFraction = 1.0` for the sane whole-input training.
    */
  def fit(
      features: Array[Array[Float]],
      targets: Array[Array[Float]],
      cfg: TrainConfig,
      trainFraction: Double = 0.3,
      log: String => Unit = _ => (),
  ): TrainStats = {
    require(features.length == targets.length, "features/targets row counts differ")
    features.foreach(f =>
      require(f.length == inputDim, s"feature row width ${f.length} != model input $inputDim"),
    )
    targets.foreach(t =>
      require(t.length == outputDim, s"target row width ${t.length} != model output $outputDim"),
    )
    val n = features.length
    val splitAt = math.min(n, (trainFraction * n).toInt)
    val trainIdx = (0 until splitAt).toArray
    val testIdx = (splitAt until n).toArray

    val rng = new Random(cfg.seed)
    val adam = newAdamStates()
    var t = 0 // Adam timestep

    val trainMse = new Array[Double](cfg.epochs)
    val testMse = new Array[Double](cfg.epochs)

    var epoch = 0
    while (epoch < cfg.epochs) {
      // per-epoch shuffle of the train split (reference shuffles via the
      // seeded DataLoader, src/nn/train.rs:72-76)
      val order = shuffled(trainIdx, rng)
      var pos = 0
      while (pos < order.length) {
        val bEnd = math.min(pos + cfg.batchSize, order.length)
        val bRows = bEnd - pos
        val xb = new Array[Float](bRows * inputDim)
        val yb = new Array[Float](bRows * outputDim)
        var r = 0
        while (r < bRows) {
          System.arraycopy(features(order(pos + r)), 0, xb, r * inputDim, inputDim)
          System.arraycopy(targets(order(pos + r)), 0, yb, r * outputDim, outputDim)
          r += 1
        }
        t += 1
        step(xb, yb, bRows, cfg.learningRate, adam, t, rng)
        pos = bEnd
      }
      trainMse(epoch) = evalMse(features, targets, trainIdx)
      testMse(epoch) = evalMse(features, targets, testIdx)
      log(
        f"[train] model=$name epoch=${epoch + 1}%d/${cfg.epochs}%d " +
          f"train_mse=${trainMse(epoch)}%.6f test_mse=${testMse(epoch)}%.6f",
      )
      epoch += 1
    }
    TrainStats(trainMse, testMse, trainIdx.length, testIdx.length)
  }

  private def shuffled(idx: Array[Int], rng: Random): Array[Int] = {
    val a = idx.clone()
    var i = a.length - 1
    while (i > 0) {
      val j = rng.nextInt(i + 1)
      val tmp = a(i); a(i) = a(j); a(j) = tmp
      i -= 1
    }
    a
  }

  private def evalMse(
      features: Array[Array[Float]],
      targets: Array[Array[Float]],
      idx: Array[Int],
  ): Double = {
    if (idx.isEmpty) return Double.NaN
    var sum = 0.0
    var k = 0
    while (k < idx.length) {
      val p = predict(features(idx(k)))
      val tgt = targets(idx(k))
      var o = 0
      while (o < p.length) {
        val d = p(o) - tgt(o)
        sum += d * d
        o += 1
      }
      k += 1
    }
    sum / (idx.length.toLong * outputDim)
  }

  /** One minibatch: forward, MSE-mean backward, Adam update. */
  private def step(
      xb: Array[Float],
      yb: Array[Float],
      rows: Int,
      lr: Float,
      adam: Array[AdamState],
      t: Int,
      rng: Random,
  ): Unit = {
    val grads = backwardBatch(xb, yb, rows, rng)
    applyGrads(grads, adam, t, lr)
  }

  /** Adam state tensors in canonical order (per layer: w, b, then
    * gamma, beta when batch-normed) — the same order
    * [[backwardBatch]] emits gradients in.
    */
  private[graft] def newAdamStates(): Array[AdamState] = layers.flatMap { l =>
    Seq(new AdamState(l.w.length), new AdamState(l.b.length)) ++
      l.bn.toSeq.flatMap(bn => Seq(new AdamState(bn.gamma.length), new AdamState(bn.beta.length)))
  }

  /** Gradients of the batch-mean MSE w.r.t. every parameter tensor, in
    * canonical tensor order. Pure w.r.t. parameters (does NOT update
    * them); BatchNorm running statistics are updated as a forward-pass
    * side effect, as in eager training.
    */
  private[graft] def backwardBatch(
      xb: Array[Float],
      yb: Array[Float],
      rows: Int,
      rng: Random,
  ): Array[Array[Float]] = {
    val tapes = forwardTrain(xb, rows, rng)
    val last = tapes.last
    val outW = layers.last.out
    // dL/dYhat for MSE with mean reduction over all elements
    val scale = 2.0f / (rows * outW)
    var dY = new Array[Float](rows * outW)
    var i = 0
    while (i < dY.length) { dY(i) = scale * (last.y(i) - yb(i)); i += 1 }

    val perLayer = new Array[Array[Array[Float]]](layers.length)
    var li = layers.length - 1
    while (li >= 0) {
      val l = layers(li)
      val tape = tapes(li)
      val size = rows * l.out
      // activation backward (gate on activation INPUT = postDrop)
      val dPost = l.activation match {
        case Activation.Identity => dY
        case Activation.Relu =>
          val d = new Array[Float](size)
          var k = 0
          while (k < size) { d(k) = if (tape.postDrop(k) > 0f) dY(k) else 0f; k += 1 }
          d
        case Activation.Tanh =>
          val d = new Array[Float](size)
          var k = 0
          while (k < size) { val yv = tape.y(k); d(k) = dY(k) * (1f - yv * yv); k += 1 }
          d
      }
      // dropout backward
      val dBn =
        if (tape.dropMask == null) dPost
        else {
          val d = new Array[Float](size)
          var k = 0
          while (k < size) { d(k) = dPost(k) * tape.dropMask(k); k += 1 }
          d
        }
      // batchnorm backward
      var dZ = dBn
      var dGamma: Array[Float] = null
      var dBeta: Array[Float] = null
      l.bn.foreach { bn =>
        dGamma = new Array[Float](l.out)
        dBeta = new Array[Float](l.out)
        dZ = new Array[Float](size)
        var o = 0
        while (o < l.out) {
          var sumDxhat = 0.0
          var sumDxhatXhat = 0.0
          var r = 0
          while (r < rows) {
            val k = r * l.out + o
            val dxh = dBn(k) * bn.gamma(o)
            sumDxhat += dxh
            sumDxhatXhat += dxh * tape.xhat(k)
            dGamma(o) += dBn(k) * tape.xhat(k)
            dBeta(o) += dBn(k)
            r += 1
          }
          val inv = tape.invStd(o)
          r = 0
          while (r < rows) {
            val k = r * l.out + o
            val dxh = dBn(k) * bn.gamma(o)
            dZ(k) = ((rows * dxh - sumDxhat - tape.xhat(k) * sumDxhatXhat) * inv / rows).toFloat
            r += 1
          }
          o += 1
        }
        ()
      }
      // linear backward
      val dW = new Array[Float](l.in * l.out)
      val dB = new Array[Float](l.out)
      var r = 0
      while (r < rows) {
        val xOff = r * l.in
        val zOff = r * l.out
        var o = 0
        while (o < l.out) { dB(o) += dZ(zOff + o); o += 1 }
        var ii = 0
        while (ii < l.in) {
          val xv = tape.x(xOff + ii)
          if (xv != 0f) {
            val wOff = ii * l.out
            var o2 = 0
            while (o2 < l.out) { dW(wOff + o2) += xv * dZ(zOff + o2); o2 += 1 }
          }
          ii += 1
        }
        r += 1
      }
      val dX = if (li > 0) {
        val d = new Array[Float](rows * l.in)
        var r2 = 0
        while (r2 < rows) {
          val xOff = r2 * l.in
          val zOff = r2 * l.out
          var o = 0
          while (o < l.out) {
            val dv = dZ(zOff + o)
            if (dv != 0f) {
              var ii = 0
              while (ii < l.in) { d(xOff + ii) += dv * l.w(ii * l.out + o); ii += 1 }
            }
            o += 1
          }
          r2 += 1
        }
        d
      } else null

      perLayer(li) =
        if (l.bn.isDefined) Array(dW, dB, dGamma, dBeta)
        else Array(dW, dB)

      dY = dX
      li -= 1
    }
    perLayer.flatten
  }

  /** Apply one Adam step from gradients in canonical tensor order. */
  private[graft] def applyGrads(
      grads: Array[Array[Float]],
      adam: Array[AdamState],
      t: Int,
      lr: Float,
  ): Unit = {
    require(grads.length == adam.length, s"${grads.length} grad tensors vs ${adam.length} states")
    var gi = 0
    layers.foreach { l =>
      adamUpdate(l.w, grads(gi), adam(gi), lr, t); gi += 1
      adamUpdate(l.b, grads(gi), adam(gi), lr, t); gi += 1
      l.bn.foreach { bn =>
        adamUpdate(bn.gamma, grads(gi), adam(gi), lr, t); gi += 1
        adamUpdate(bn.beta, grads(gi), adam(gi), lr, t); gi += 1
      }
    }
  }

  private def adamUpdate(
      p: Array[Float],
      g: Array[Float],
      s: AdamState,
      lr: Float,
      t: Int,
  ): Unit = {
    val b1 = 0.9f
    val b2 = 0.999f
    val eps = 1e-8f
    val c1 = (1.0 - math.pow(b1, t)).toFloat
    val c2 = (1.0 - math.pow(b2, t)).toFloat
    var i = 0
    while (i < p.length) {
      s.m(i) = b1 * s.m(i) + (1 - b1) * g(i)
      s.v(i) = b2 * s.v(i) + (1 - b2) * g(i) * g(i)
      val mh = s.m(i) / c1
      val vh = s.v(i) / c2
      p(i) -= lr * mh / (math.sqrt(vh).toFloat + eps)
      i += 1
    }
  }
}

object Mlp {

  /** Build an untrained model from a spec JSON, Xavier-uniform init,
    * deterministic under `seed` (reference builds via Model::from_spec,
    * src/nn/model.rs:60-107, with Burn's default initializer).
    */
  def fromSpec(name: String, specJson: String, seed: Long = 42L): Mlp = {
    val spec = NetworkSpec.parse(specJson)
    val rng = new Random(seed ^ name.hashCode.toLong)
    val layers = spec.layers.map { ls =>
      val limit = math.sqrt(6.0 / (ls.in + ls.out)).toFloat
      val w = Array.fill(ls.in * ls.out)((rng.nextFloat() * 2 - 1) * limit)
      val b = new Array[Float](ls.out)
      val bn = if (ls.batchNorm) Some(new BatchNormParams(ls.out)) else None
      new DenseLayer(ls.in, ls.out, w, b, ls.activationKind, bn, ls.dropout)
    }.toArray
    new Mlp(name, specJson, spec, layers)
  }
}
