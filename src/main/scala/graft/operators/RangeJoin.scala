package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Bounded-interval (range) join: every (left, right) pair sharing the
  * equi-keys with `right.ts ∈ [left.ts + lower, left.ts + upper]`
  * (inclusive bounds) — "events in the N minutes around X", the
  * context-window primitive behind attribution joins and feature
  * windows.
  *
  * Spark-first scale design — BIN BUCKETING, not an inequality join:
  * a plain `l JOIN r ON key AND r.ts BETWEEN …` gives Catalyst only
  * the key equi-condition; every same-key pair is generated BEFORE
  * the range predicate filters, which is quadratic per key. Instead,
  * time is cut into bins of width = (upper − lower): each right row
  * lands in exactly one bin, each left row's window covers at most
  * TWO consecutive bins, so an equi-join on (key, bin) generates
  * every qualifying pair exactly once (the pair is produced only in
  * the right row's bin; the ≤2 left bins are distinct → no dup, no
  * post-distinct) while candidate generation is linear in true
  * matches + near-misses inside the same bins. One shuffle, join
  * width O(rows · 2), never O(pairs-per-key²).
  *
  * Output: every left column, plus `right_ts` and `right_<c>` for
  * each requested payload column — INNER semantics (pair rows);
  * aggregate + left-join back for per-left-row rollups with empty
  * windows preserved.
  */
object RangeJoin {

  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      lowerMicros: Long,
      upperMicros: Long,
      rightPayloadCols: Seq[String],
  ): DataFrame = {
    require(upperMicros >= lowerMicros, s"empty interval: [$lowerMicros, $upperMicros]")
    require(keyCols.nonEmpty, "interval join needs at least one equi-key")
    val width = math.max(1L, upperMicros - lowerMicros)
    val leftCols = left.columns.toSeq
    val outNames = "right_ts" +: rightPayloadCols.map("right_" + _)
    require(
      !leftCols.exists(outNames.contains),
      s"left columns collide with output names: ${leftCols.intersect(outNames).mkString(",")}",
    )
    val lmic = unix_micros(col(leftTsCol))
    // EXACT integer floor division ((x − pmod(x,w)) / w): double
    // division + floor can misplace boundary values by a ULP, which
    // would break the pairs-exactly-once guarantee at bin edges
    def bin(micros: org.apache.spark.sql.Column) =
      ((micros - pmod(micros, lit(width))) / lit(width)).cast("long")
    val l = left
      .withColumn("__bin", explode(array_distinct(array(
        bin(lmic + lit(lowerMicros)),
        bin(lmic + lit(upperMicros)),
      ))))
    val r = right.select(
      keyCols.map(col) ++ Seq(
        bin(unix_micros(col(rightTsCol))).as("__bin"),
        col(rightTsCol).as("right_ts"),
      ) ++ rightPayloadCols.map(c => col(c).as(s"right_$c")): _*,
    )
    l.join(r, keyCols :+ "__bin")
      .where(
        unix_micros(col("right_ts")).between(lmic + lit(lowerMicros), lmic + lit(upperMicros)),
      )
      .select((leftCols ++ outNames).map(col): _*)
  }
}
