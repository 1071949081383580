package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic, content/id-addressed sampling primitives for corpus
  * curation: the same row set comes back on every run, on any cluster
  * layout, with no RNG state — reproducibility is the point (published
  * dataset recipes, ablation reruns, incremental refreshes).
  *
  * Scale shapes:
  *   - [[hashSplit]] is a pure projection — shuffle-free, streams at
  *     scan speed, works identically on 100 TB.
  *   - [[stratifiedSample]] takes exact per-stratum quotas, which
  *     requires a per-stratum order — ONE window shuffle, sort bounded
  *     by stratum size. For huge strata where an exact quota isn't
  *     worth a sort, the shuffle-free alternative is a hash-threshold
  *     filter (see [[TextAnalysis.contentSample]]) whose sample size
  *     is only binomially-approximate.
  */
object Sampling {

  /** Exact proportional stratified sample: ⌈frac · |stratum|⌉ rows
    * from every stratum, chosen by md5 order of the id column —
    * deterministic, uniform w.r.t. content-independent ids, stable
    * under corpus growth within unchanged strata prefixes.
    */
  def stratifiedSample(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      frac: Double,
  ): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac must be in (0,1]: $frac")
    val order = md5(col(idCol).cast("string"))
    val w = Window.partitionBy(col(stratumCol)).orderBy(order, col(idCol))
    val n = Window.partitionBy(col(stratumCol))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(n))
      .where(col("__rn") <= ceil(col("__n") * frac))
      .drop("__rn", "__n")
  }

  /** Cap every stratum at `maxRows` rows (md5-of-id order) — the
    * per-domain/per-source cap that stops a single crawl domain from
    * dominating a training mix. Deterministic (same survivors every
    * run); one window shuffle, sort bounded by stratum size; strata
    * already under the cap pass through complete.
    */
  def capPerStratum(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      maxRows: Int,
  ): DataFrame = {
    require(maxRows > 0, s"maxRows must be positive: $maxRows")
    val w = Window
      .partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= maxRows)
      .drop("__rn")
  }

  /** Deterministic mixture downsampling: keep a per-stratum FRACTION
    * (e.g. rebalance web/books/code domains to a target mix) by md5
    * threshold of the id — pure projection + filter, shuffle-free at
    * any scale (the exact-quota alternative is [[stratifiedSample]] /
    * [[capPerStratum]], which pay one window shuffle). Strata absent
    * from `fractions` keep `defaultFraction` (default: dropped).
    * Sample size per stratum is binomial around n·frac, not exact —
    * the price of zero shuffles; assignments are stable under corpus
    * growth (a kept row stays kept when new rows arrive).
    */
  def mixtureSample(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0,
  ): DataFrame = {
    require(
      (fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0 && f <= 1),
      s"fractions must be in [0,1]: $fractions",
    )
    val prefix = substring(md5(col(idCol).cast("string")), 1, 4)
    df.where(prefix < stratumCase(stratumCol, fractions, defaultFraction)(hexBound))
  }

  /** Literal per-stratum CASE chain shared by the md5-threshold
    * operators ([[mixtureSample]], [[epochExpand]]): `stratum = k →
    * lit(f(v_k))` in sorted-key order (one deterministic plan per
    * map), falling to `lit(f(default))` — which also catches NULL
    * strata, since a null equality is never true.
    */
  private def stratumCase[T](
      stratumCol: String, m: Map[String, Double], default: Double)(
      f: Double => T): Column =
    m.toSeq.sortBy(_._1).foldRight(lit(f(default))) {
      case ((stratum, v), rest) =>
        when(col(stratumCol) === stratum, lit(f(v))).otherwise(rest)
    }

  /** 4-hex-char EXCLUSIVE threshold for a [0,1] fraction, shared by
    * every md5-prefix predicate (Column and SQL twins — both engines
    * compare the same strings). "g" sorts above every hex digit, so a
    * full fraction keeps ALL rows; the clamp must apply to the
    * ROUNDED value, not the input: any fraction ≥ 1 − 1/131072 rounds
    * to 65536, whose %04x form is the 5-char "10000" — that string
    * sorts BELOW every prefix not starting with '0' and would keep
    * ~6% of rows where the caller asked for ~100% (temperatureSample's
    * `min(1, share·budget/n)` routinely lands just under 1).
    */
  private def hexBoundInt(b: Int): String =
    if (b >= 65536) "g" else f"$b%04x"
  private def hexBound(f: Double): String =
    hexBoundInt(math.round(f * 65536.0).toInt)

  /** Temperature-smoothed mixture shares — the multilingual-LM
    * rebalancing recipe (alpha-sampling: Conneau et al. XLM-R '19,
    * Xue et al. mT5 '21): a stratum with n_i rows gets share
    * `n_i^alpha / Σ n_j^alpha`. `alpha = 1` keeps natural
    * proportions; `alpha → 0` approaches uniform — the knob that
    * keeps a 1000× head language from drowning tail languages
    * without discarding the size signal entirely.
    *
    * Output: one row per stratum — (stratum, n, share,
    * sample_fraction) where `sample_fraction =
    * min(1, share·budgetRows / n)` is the per-stratum keep rate that
    * realizes the smoothed mix inside a total row budget.
    *
    * Scale shape: ONE count aggregation (map-side combined); the
    * per-stratum math runs on the driver over the stratum list —
    * strata are languages/domains/sources, bounded by design, never
    * corpus-sized. Weights are summed in sorted-stratum order so the
    * result is a pure deterministic function of the counts.
    */
  def temperatureFractions(
      df: DataFrame,
      stratumCol: String,
      alpha: Double,
      budgetRows: Long,
  ): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1]: $alpha")
    require(budgetRows > 0, s"budgetRows must be > 0: $budgetRows")
    val spark = df.sparkSession
    import spark.implicits._
    // NULL strata are excluded (they'd NPE the driver-side sort, and
    // mixtureSample's equality threshold can never match them anyway
    // — a null-keyed stratum is malformed input, not a mixture
    // component; the rows fall under mixtureSample's defaultFraction)
    val counts = df
      .where(col(stratumCol).isNotNull)
      .groupBy(col(stratumCol).cast("string").as("stratum"))
      .agg(count(lit(1)).as("n"))
      .as[(String, Long)]
      .collect()
      .sortBy(_._1)
    val weights = counts.map { case (_, n) => math.pow(n.toDouble, alpha) }
    val total = weights.sum
    counts
      .zip(weights)
      .map { case ((stratum, n), w) =>
        val share = w / total
        (stratum, n, share, math.min(1.0, share * budgetRows / n))
      }
      .toSeq
      .toDF("stratum", "n", "share", "sample_fraction")
  }

  /** [[temperatureFractions]] composed with [[mixtureSample]]: keep a
    * temperature-rebalanced, budget-bounded subset in one call. Two
    * jobs (the count, then the shuffle-free threshold filter); the
    * kept set is deterministic and stable under reruns.
    */
  def temperatureSample(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      alpha: Double,
      budgetRows: Long,
  ): DataFrame = {
    val fractions = temperatureFractions(df, stratumCol, alpha, budgetRows)
      .select(col("stratum"), col("sample_fraction"))
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap
    mixtureSample(df, stratumCol, idCol, fractions)
  }

  /** Deterministic train/val/test (or any K-way) split by md5 bucket
    * of `keyCol`: 65 536 hex buckets are carved into contiguous
    * ranges proportional to `weights`, and each row's 4-hex-char md5
    * prefix selects its range lexicographically. Pure projection —
    * no shuffle, no RNG, stable across runs and engines (any system
    * with md5 + substr reproduces the assignment bit-for-bit).
    */
  def hashSplit(
      df: DataFrame,
      keyCol: String,
      weights: Seq[Double],
      labels: Seq[String],
      splitCol: String = "split",
  ): DataFrame =
    df.withColumn(splitCol, hashSplitColumn(col(keyCol), weights, labels))

  /** The split-assignment expression alone (compose into any plan). */
  def hashSplitColumn(key: Column, weights: Seq[Double], labels: Seq[String]): Column = {
    require(weights.length == labels.length && weights.nonEmpty, "weights/labels mismatch")
    require(weights.forall(_ > 0), "weights must be positive")
    val total = weights.sum
    // cumulative upper bounds as 4-hex-char strings (exclusive)
    val bounds = weights
      .scanLeft(0.0)(_ + _)
      .tail
      .map(c => math.round(c / total * 65536.0).toInt)
    val prefix = substring(md5(key.cast("string")), 1, 4)
    // hexBoundInt: a non-final cumulative weight ≥ 1 − 1/131072 rounds
    // to 65536 — unclamped %04x ("10000") would send ~94% of the rows
    // meant for that label to the catch-all tail label instead
    val assigned = labels.zip(bounds).init.foldRight(lit(labels.last)) {
      case ((label, bound), rest) =>
        when(prefix < lit(hexBoundInt(bound)), lit(label)).otherwise(rest)
    }
    assigned
  }

  /** Leakage-safe K-way split: near-duplicate documents must land in
    * the SAME split, or evaluation leaks — a test doc with a near-dup
    * in train is effectively memorized. [[hashSplit]] keys on the doc
    * id, so near-dup partners split independently; this variant first
    * connects near-dup pairs into components
    * ([[Dedup.minHashNearDupPairs]] → [[Dedup.connectedComponents]])
    * and keys the hash split on the COMPONENT id, so whole duplicate
    * groups co-assign. Docs with no near-dup are their own component
    * (split exactly as [[hashSplit]] on their id would).
    *
    * Scale shape: the banded near-dup machinery + the O(log n)
    * component rounds dominate; the split itself stays a pure
    * projection. The group-id join is an equi-join on the (small)
    * paired-doc set — unpaired docs skip it via the left join's
    * coalesce.
    *
    * Output: df + `component` (the split key) + `splitCol`.
    */
  def leakageSafeSplit(
      df: DataFrame,
      idCol: String,
      textCol: String,
      weights: Seq[Double],
      labels: Seq[String],
      jaccardThreshold: Double = 0.8,
      splitCol: String = "split",
  ): DataFrame = {
    val pairs = Dedup.minHashNearDupPairs(df, idCol, textCol, threshold = jaccardThreshold)
    val comp = Dedup.connectedComponents(pairs) // (id, component) — paired docs only
    df.join(comp.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("component", coalesce(col("component"), col(idCol)))
      .withColumn(splitCol, hashSplitColumn(col("component"), weights, labels))
  }

  /** [[mixtureSample]]'s predicate as SQL text (oracle/portability
    * parity — any engine with md5 + substr reproduces the row set).
    */
  def mixtureSampleSql(
      stratumExpr: String,
      keyExpr: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0,
  ): String = {
    val prefix = s"substr(md5(CAST($keyExpr AS VARCHAR)), 1, 4)"
    // no per-stratum overrides: a CASE with zero WHEN branches is a
    // syntax error in every engine — compare against the bare default
    if (fractions.isEmpty)
      return s"$prefix < '${hexBound(defaultFraction)}'"
    val whens = fractions.toSeq
      .map { case (s, f) => s"WHEN '$s' THEN '${hexBound(f)}'" }
      .mkString(" ")
    s"$prefix < (CASE $stratumExpr $whens ELSE '${hexBound(defaultFraction)}' END)"
  }

  /** Greedy token-budget selection: rank every row by `prefer`
    * (best first; ties broken by `idCol` so the order is total), keep
    * rows while the RUNNING token total stays ≤ `budget` — the
    * "best docs that fit the training budget" curation step. A row
    * that would cross the budget is dropped but scanning continues
    * conceptually; since the running sum is monotone, dropping
    * everything past the crossing point is equivalent (standard
    * prefix-budget semantics, matches the SQL-window oracle exactly —
    * integer arithmetic only).
    *
    * Scale shape: the running sum is [[Packing.withPrefixSumOrdered]]'s
    * distributed prefix sum — range-partition on the preference order,
    * cumulate within partitions in parallel, add per-partition offsets
    * from a #partitions-row summary. NO single-partition window over
    * the corpus (the naive `Window.orderBy` with no partition spec
    * would funnel 100 TB through one task); bit-identical to the
    * global-window oracle at every scale.
    *
    * NULL `tokenCol` rows count as 0 tokens: they are kept (they never
    * cross the budget) and leave the running total unchanged — exactly
    * what a SQL window `sum` (which skips NULLs) produces, so the
    * window oracle and this operator agree row-for-row; the row's own
    * `tokenCol` value passes through un-coalesced.
    *
    * Output: the kept rows + `cum_tokens` (running total including
    * the row itself). The result is eagerly materialized per
    * `materialize` so the intermediate prefix-sum cache can be
    * released HERE — callers owe no `unpersist`. The default
    * `LocalCheckpoint` keeps blocks in executor storage (freed on
    * GC, no recovery from executor loss); pass
    * [[Materialize.ParquetDir]] to land the selection durably when
    * the selected slice is itself corpus-sized.
    */
  def tokenBudgetSelect(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      prefer: Seq[Column],
      budget: Long,
      materialize: Materialize = Materialize.LocalCheckpoint,
  ): DataFrame = {
    val order = prefer :+ col(idCol).asc
    val (prefixed, handle) = Packing.withPrefixSumOrdered(
      df.withColumn("__tok", coalesce(col(tokenCol).cast("long"), lit(0L))),
      order,
      col("__tok"),
      "__before",
    )
    val out = Materialize(
      prefixed
        .withColumn("cum_tokens", col("__before") + col("__tok"))
        .where(col("cum_tokens") <= budget)
        .drop("__before", "__tok"),
      materialize,
    )
    handle.unpersist(blocking = false)
    out
  }

  /** Data-recipe EPOCH planner — the upsampling half
    * [[temperatureFractions]] cannot express (its `sample_fraction`
    * clamps at 1): given target mixture `weights` and a total token
    * `budget`, each stratum's plan is
    * `epochs = min(maxEpochs, target / n_tokens)` with
    * `target = weight/Σweights · budget` — sources whose natural share
    * falls short of their target REPEAT for multiple epochs, capped at
    * `maxEpochs` (repeating data beyond ~4 epochs stops buying loss —
    * Muennighoff et al. 2023, data-constrained scaling; the published
    * LLaMA-1 recipe upsamples books/wikipedia ~2 epochs this way).
    * Fractional epochs are the norm, not an error — feed the plan to
    * [[epochExpand]] to materialize them.
    *
    * Output: one row per stratum PRESENT in `df` and NAMED in
    * `weights` — (stratum, n_docs, n_tokens, weight, target_tokens,
    * epochs, realized_tokens, shortfall_tokens), where shortfall > 0
    * exposes sources whose cap left their target unmet (the caller
    * re-weights or accepts). Strata in `df` without a weight emit NO
    * row (they are planned out — feed the plan to [[epochExpand]],
    * whose `defaultEpochs = 0` drops them); weight keys absent from
    * `df` contribute to normalization (the user's stated recipe) but
    * emit no row either.
    *
    * Scale shape: ONE map-side-combined aggregation over the corpus;
    * the plan arithmetic runs driver-side over the stratum list
    * (sources/languages — bounded by design). Normalization sums the
    * weight map in sorted-key order, and every derived column is a
    * chain of single IEEE ops on exact inputs, so the plan is a pure
    * deterministic function of (counts, weights, budget) that a SQL
    * engine replays bit-for-bit.
    */
  def epochPlan(
      df: DataFrame,
      stratumCol: String,
      tokenCol: String,
      weights: Map[String, Double],
      budgetTokens: Long,
      maxEpochs: Double = 4.0,
  ): DataFrame = {
    require(weights.nonEmpty, "epochPlan: weights must be non-empty")
    require(weights.values.forall(w => w >= 0 && !w.isNaN && !w.isInfinite),
      s"epochPlan: weights must be finite and >= 0: $weights")
    require(budgetTokens > 0, s"epochPlan: budgetTokens must be > 0: $budgetTokens")
    require(maxEpochs > 0, s"epochPlan: maxEpochs must be > 0: $maxEpochs")
    val spark = df.sparkSession
    import spark.implicits._
    val wsum = weights.toSeq.sortBy(_._1).map(_._2).sum
    require(wsum > 0, s"epochPlan: weights must not all be zero: $weights")
    val counts = df
      .where(col(stratumCol).isNotNull)
      .groupBy(col(stratumCol).cast("string").as("stratum"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col(tokenCol).cast("long"), lit(0L))).as("n_tokens"))
      .as[(String, Long, Long)]
      .collect()
      .sortBy(_._1)
    counts
      .filter { case (s, _, _) => weights.contains(s) }
      .map { case (stratum, nDocs, nTokens) =>
        val w = weights(stratum) / wsum
        val target = w * budgetTokens
        val epochs =
          if (nTokens <= 0L) 0.0 else math.min(maxEpochs, target / nTokens)
        val realized = epochs * nTokens
        (stratum, nDocs, nTokens, w, target, epochs, realized, target - realized)
      }
      .toSeq
      .toDF("stratum", "n_docs", "n_tokens", "weight", "target_tokens",
        "epochs", "realized_tokens", "shortfall_tokens")
  }

  /** Materialize an epoch plan: each row of a stratum with planned
    * epochs `e` appears `floor(e)` times plus once more in the
    * FRACTIONAL epoch iff its md5 prefix clears the [[mixtureSample]]
    * threshold for `e − floor(e)` — so `e = 2.25` replicates every row
    * twice and a deterministic quarter of rows a third time, `e = 0.5`
    * reduces to exactly `mixtureSample`'s keep-half, and `e = 0` drops
    * the stratum. The emitted `epoch` column (0-based) lets downstream
    * shuffling/packing keep replicas apart so one sequence never sees
    * the same document twice in a row — key the shuffle on the
    * COMPOSITE (id, epoch), e.g. `concat(id, '#', epoch)`: replicas
    * share `idCol`, so keying the shuffle on the bare id hands every
    * replica the SAME position key and lands them adjacent (spec'd).
    *
    * Deterministic and rerun-stable (the fractional subset is a pure
    * function of the id), shuffle-free (per-row `explode` of a ≤
    * `ceil(e)`-element sequence — output size is the plan's realized
    * volume, never a blowup: epochs are validated ≤ 100, far above any
    * published recipe but a hard wall against a fat-fingered explode).
    * Strata absent from `epochs` fall to `defaultEpochs` (0 = planned
    * out, 1 = pass through once).
    */
  def epochExpand(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      epochs: Map[String, Double],
      defaultEpochs: Double = 0.0,
  ): DataFrame = {
    (epochs.values ++ Seq(defaultEpochs)).foreach { e =>
      require(e >= 0 && e <= 100 && !e.isNaN,
        s"epochExpand: epochs must be in [0,100]: $epochs default=$defaultEpochs")
    }
    def fullOf(e: Double) = math.floor(e).toInt
    def boundOf(e: Double) = hexBound(e - math.floor(e))
    val fullCol = stratumCase(stratumCol, epochs, defaultEpochs)(fullOf)
    val boundCol = stratumCase(stratumCol, epochs, defaultEpochs)(boundOf)
    val prefix = substring(md5(col(idCol).cast("string")), 1, 4)
    val copies = fullCol + when(prefix < boundCol, 1).otherwise(0)
    df.withColumn(
      "epoch",
      explode(when(copies > 0, sequence(lit(0), copies - 1))
        .otherwise(array().cast("array<int>"))))
  }

  /** [[epochPlan]] composed with [[epochExpand]] — the
    * [[temperatureSample]] shape for epoch recipes: one call from
    * (weights, token budget) to the materialized corpus with its
    * `epoch` column. Two jobs (the plan's count aggregation, then the
    * shuffle-free replication); strata the plan omits (unweighted, or
    * weighted but absent) expand to zero. Returns (plan, expanded) so
    * callers can land the audit rows alongside the data.
    */
  def epochSample(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      tokenCol: String,
      weights: Map[String, Double],
      budgetTokens: Long,
      maxEpochs: Double = 4.0,
  ): (DataFrame, DataFrame) = {
    val plan = epochPlan(df, stratumCol, tokenCol, weights, budgetTokens, maxEpochs)
    val epochs = plan
      .select(col("stratum"), col("epochs"))
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap
    (plan, epochExpand(df, stratumCol, idCol, epochs, defaultEpochs = 0.0))
  }

  /** The same bounds as SQL text, for oracle/portability parity:
    * CASE WHEN substr(md5(CAST(key AS VARCHAR)),1,4) < 'xxxx' THEN …
    */
  def hashSplitSql(keyExpr: String, weights: Seq[Double], labels: Seq[String]): String = {
    require(weights.length == labels.length && weights.nonEmpty, "weights/labels mismatch")
    require(weights.forall(_ > 0), "weights must be positive")
    // one label: a CASE with zero WHEN branches is a syntax error in
    // every engine — the Column twin returns lit(label); mirror it
    if (labels.length == 1) return s"'${labels.head}'"
    val total = weights.sum
    val bounds = weights
      .scanLeft(0.0)(_ + _)
      .tail
      .map(c => math.round(c / total * 65536.0).toInt)
    val prefix = s"substr(md5(CAST($keyExpr AS VARCHAR)), 1, 4)"
    val whens = labels.zip(bounds).init
      .map { case (label, bound) => s"WHEN $prefix < '${hexBoundInt(bound)}' THEN '$label'" }
      .mkString(" ")
    s"CASE $whens ELSE '${labels.last}' END"
  }
}
