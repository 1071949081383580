package graft

import graft.operators.Whitening

class WhiteningSpec extends SparkTestBase {
  import spark.implicits._

  /** Deterministic correlated 3-d data: x2 = x0 + x1 + noise-ish
    * structure, means far from zero — exercises centering, rotation,
    * and scaling at once.
    */
  private def corpus(n: Int) =
    (1 to n).map { i =>
      val a = math.sin(i * 0.7) + 2.0
      val b = math.cos(i * 1.3) * 3.0 - 1.0
      Tuple1(Array((a).toFloat, (b).toFloat, (a + b + 0.1 * math.sin(i * 2.9)).toFloat))
    }.toDF("v").repartition(5)

  test("moments: exact mean and covariance on a known frame") {
    val df = Seq(
      Tuple1(Array(1f, 2f)),
      Tuple1(Array(3f, 6f)),
    ).toDF("v")
    val (n, mean, cov) = Whitening.moments(df, "v")
    assert(n == 2 && mean.toSeq == Seq(2.0, 4.0))
    // population covariance of {(1,2),(3,6)}: var0=1, var1=4, cov=2
    assert(cov(0)(0) == 1.0 && cov(1)(1) == 4.0 && cov(0)(1) == 2.0 && cov(1)(0) == 2.0)
  }

  test("PCA whitening maps the covariance to identity") {
    val df = corpus(800)
    val model = Whitening.fit(df, "v")
    val white = Whitening.transform(df, "v", model)
    val (_, mean, cov) = Whitening.moments(white.select("white"), "white")
    mean.foreach(m => assert(math.abs(m) < 1e-4, s"mean $m"))
    for (i <- cov.indices; j <- cov.indices) {
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(cov(i)(j) - want) < 0.01, s"cov($i)($j)=${cov(i)(j)}")
    }
  }

  test("ZCA whitening also whitens, with a symmetric basis") {
    val df = corpus(600)
    val model = Whitening.fit(df, "v", zca = true)
    for (i <- 0 until model.dim; j <- 0 until model.dim)
      assert(math.abs(model.basis(i)(j) - model.basis(j)(i)) < 1e-9,
        "ZCA basis must be symmetric")
    val white = Whitening.transform(df, "v", model)
    val (_, _, cov) = Whitening.moments(white.select("white"), "white")
    for (i <- cov.indices; j <- cov.indices) {
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(cov(i)(j) - want) < 0.01, s"cov($i)($j)=${cov(i)(j)}")
    }
  }

  test("rank-deficient directions come out near-zero, never amplified") {
    // third dim is EXACTLY x0+x1: one zero eigenvalue
    val df = (1 to 400).map { i =>
      val a = math.sin(i * 0.7).toFloat
      val b = math.cos(i * 1.3).toFloat
      Tuple1(Array(a, b, a + b))
    }.toDF("v").repartition(4)
    val model = Whitening.fit(df, "v")
    assert(model.eigenvalues.last < 1e-9 * model.eigenvalues.head)
    val white = Whitening.transform(df, "v", model)
      .select("white").as[Array[Float]].collect()
    // every output must be finite; the null direction stays tiny
    white.foreach { v =>
      v.foreach(x => assert(!x.isNaN && !x.isInfinite))
      assert(math.abs(v(2)) < 0.1, s"null direction blew up: ${v(2)}")
    }
  }

  test("all-zero covariance (identical vectors) yields finite zero outputs, not NaN") {
    val df = Seq.fill(5)(Tuple1(Array(1f, 2f, 3f))).toDF("v")
    val model = Whitening.fit(df, "v")
    model.basis.foreach(_.foreach(x => assert(!x.isNaN && !x.isInfinite)))
    val out = Whitening.transform(df, "v", model).select("white").as[Array[Float]].collect()
    out.foreach(v => v.foreach(x => assert(x == 0f, s"expected 0, got $x")))
  }

  test("NULL vectors pass through as NULL; ragged widths are rejected") {
    val df = Seq(Some(Array(1f, 2f)), None, Some(Array(2f, 1f))).map(Tuple1(_)).toDF("v")
    val model = Whitening.fit(df.where($"v".isNotNull), "v")
    val out = Whitening.transform(df, "v", model).select("white").collect()
    assert(out.count(_.isNullAt(0)) == 1)
    val ragged = Seq(Tuple1(Array(1f, 2f)), Tuple1(Array(1f, 2f, 3f))).toDF("v")
    intercept[Exception](Whitening.moments(ragged, "v"))
  }

  test("widths beyond MaxMomentsDim are rejected with a named error, not an OOM hazard") {
    val wide = Seq(Tuple1(new Array[Float](Whitening.MaxMomentsDim + 1))).toDF("v")
    val e = intercept[Exception](Whitening.moments(wide, "v"))
    val messages = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString("\n")
    assert(messages.contains("MaxMomentsDim"), messages.take(300))
    // the bound itself is inclusive: d == MaxMomentsDim must fit (use a
    // tiny row count so the d² partial allocates once, cheaply)
    val atBound = Seq(Tuple1(new Array[Float](16))).toDF("v")
    assert(Whitening.moments(atBound, "v")._1 == 1L)
  }
}
