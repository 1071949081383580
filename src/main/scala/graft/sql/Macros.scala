package graft.sql

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Scala ports of the reference demo's SQL macros
  * (reference: test/sql/autompg.sql:4-16) — the parameterized-
  * expression (S4) and table-macro (S5/S6) surface of SURVEY §2.2.
  */
object Macros {

  /** `min_max_scaler(val, min, max) := (val-min)/nullif(max-min, 0)`
    * (reference test/sql/autompg.sql:14-16, incl. the div-by-zero
    * nullif guard — S11).
    */
  def minMaxScaler(value: Column, min: Column, max: Column): Column =
    (value - min) / nullif(max - min, lit(0))

  /** `scaling_params(table, cols)` — one row of min_/max_/avg_ per
    * column (reference test/sql/autompg.sql:4-10 with its
    * `COLUMNS(list)`/alias-template expansion done programmatically —
    * S5/S6). Single hash-agg pass over the relation; partial
    * aggregation makes this one narrow shuffle at any scale.
    */
  def scalingParams(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        min(col(c)).as(s"min_$c"),
        max(col(c)).as(s"max_$c"),
        // avg via exact decimal sum: associative, so the result is
        // identical under any partitioning (plain double-sum avg is
        // not reproducible run-to-run at scale)
        (sum(col(c).cast("decimal(18,6)")).cast("double") / count(lit(1))).as(s"avg_$c"),
      )
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Attach `scaling_params` to every row and replace each listed
    * column with its min-max-scaled value (the reference pipeline's
    * normalize step, test/sql/autompg.sql:60-72). The 1-row params
    * side is explicitly broadcast — a BroadcastNestedLoopJoin, never a
    * shuffle, regardless of the fact side's size (S10).
    */
  def minMaxScale(df: DataFrame, cols: Seq[String]): DataFrame = {
    val params = scalingParams(df, cols)
    val joined = df.crossJoin(broadcast(params))
    val scaled = cols.foldLeft(joined) { (acc, c) =>
      acc.withColumn(c, minMaxScaler(col(c), col(s"min_$c"), col(s"max_$c")))
    }
    scaled.drop(params.columns: _*)
  }
}
