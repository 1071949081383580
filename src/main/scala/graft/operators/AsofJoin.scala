package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Point-in-time (as-of) join: for every left row, attach the LATEST
  * right row with `right.ts <= left.ts` (backward direction; strict
  * `<` optional) sharing the join keys — the temporal-join primitive
  * behind feature lookups ("state of the user profile when the event
  * happened"), sessionized attribution, and slowly-changing-dimension
  * reads.
  *
  * Spark-first scale design — the UNION + WINDOW formulation, not a
  * range join:
  *   - Tag left and right rows, union them, and run ONE window
  *     (`partitionBy(keys) orderBy(ts, side, payload)`) taking the
  *     running `last(right_payload, ignoreNulls)`; left rows then
  *     carry exactly their as-of match. Total cost: ONE shuffle of
  *     |L| + |R| rows and a per-key sort — no range-condition
  *     explosion (a naive `l JOIN r ON key AND r.ts <= l.ts` is
  *     O(|L| × matching-|R|) rows BEFORE the per-row max, which is
  *     quadratic per key at 100 TB), no broadcast bound on either
  *     side, and AQE-managed partitioning by key.
  *   - Skew: bounded by rows per join key (a user's event history),
  *     the same bound any per-key sessionization already carries.
  *   - Ties: right rows are ordered (ts, side, payload struct), so at
  *     equal timestamps the LARGEST payload struct wins
  *     deterministically; callers wanting a specific tie-break rule
  *     pre-dedupe the right side (one map-side-combinable aggregate).
  *
  * Output: every left column, then `asof_ts` (matched right
  * timestamp) and `asof_<payload>` for each requested right column —
  * all NULL when no right row qualifies (left-join semantics).
  */
object AsofJoin {

  /** Backward as-of: LATEST right with `right.ts <= left.ts`. */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      rightPayloadCols: Seq[String],
      inclusive: Boolean = true,
      toleranceMicros: Option[Long] = None,
  ): DataFrame =
    asofImpl(left, right, keyCols, leftTsCol, rightTsCol, rightPayloadCols,
      inclusive, toleranceMicros, forward = false)

  /** Forward as-of: EARLIEST right with `right.ts >= left.ts` — the
    * "next reading after the event" direction (pandas merge_asof
    * direction='forward'). Same one-shuffle union+window shape as the
    * backward join, scanning each key's timeline DESCENDING: the
    * running `last(right)` at a left row is then exactly the smallest
    * qualifying right timestamp. Ties at equal right ts keep the
    * largest payload struct (same rule as backward).
    */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      rightPayloadCols: Seq[String],
      inclusive: Boolean = true,
      toleranceMicros: Option[Long] = None,
  ): DataFrame =
    asofImpl(left, right, keyCols, leftTsCol, rightTsCol, rightPayloadCols,
      inclusive, toleranceMicros, forward = true)

  /** Nearest as-of (pandas direction='nearest'): the closer of the
    * backward and forward matches; equidistant → backward (pandas'
    * rule). ONE shuffle: both directions are windows over the same
    * tagged union with the same `partitionBy(keys)` hash partitioning,
    * so Catalyst plans one Exchange and two per-key Sorts (asc for the
    * backward scan, desc for the forward scan) — half the shuffle
    * volume of running the two directional joins separately.
    */
  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      rightPayloadCols: Seq[String],
      inclusive: Boolean = true,
      toleranceMicros: Option[Long] = None,
  ): DataFrame = {
    val (union, leftCols) =
      taggedUnion(left, right, keyCols, leftTsCol, rightTsCol, rightPayloadCols, inclusive)
    val wB = timelineWindow(keyCols, forward = false)
    val wF = timelineWindow(keyCols, forward = true)
    val lefts = union
      .withColumn("__mb", last(col("__r"), ignoreNulls = true).over(wB))
      .withColumn("__mf", last(col("__r"), ignoreNulls = true).over(wF))
      .where(col("__side") === 1)
    val bDist = unix_micros(col("__ts")) - unix_micros(col("__mb.__ats"))
    val fDist = unix_micros(col("__mf.__ats")) - unix_micros(col("__ts"))
    val bounded = toleranceMicros match {
      case Some(tol) =>
        lefts
          .withColumn("__mb", when(bDist <= tol, col("__mb")))
          .withColumn("__mf", when(fDist <= tol, col("__mf")))
      case None => lefts
    }
    // decide ONCE into __m (distances recomputed over the bounded
    // columns so a tolerance-voided direction can't win)
    val decided = bounded.withColumn(
      "__m",
      when(
        col("__mb").isNotNull && (col("__mf").isNull || bDist <= fDist),
        col("__mb"),
      ).otherwise(col("__mf")))
    selectAsofOutput(decided, leftCols, rightPayloadCols)
  }

  private def asofImpl(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      rightPayloadCols: Seq[String],
      inclusive: Boolean,
      toleranceMicros: Option[Long],
      forward: Boolean,
  ): DataFrame = {
    val (union, leftCols) =
      taggedUnion(left, right, keyCols, leftTsCol, rightTsCol, rightPayloadCols, inclusive)
    val w = timelineWindow(keyCols, forward)
    val withMatch = union
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val bounded = toleranceMicros match {
      case Some(tol) =>
        val dist =
          if (forward) unix_micros(col("__m.__ats")) - unix_micros(col("__ts"))
          else unix_micros(col("__ts")) - unix_micros(col("__m.__ats"))
        withMatch.withColumn(
          "__m",
          when(dist <= tol, col("__m")), // else NULL: beyond the tolerance window
        )
      case None => withMatch
    }
    selectAsofOutput(bounded, leftCols, rightPayloadCols)
  }

  /** Tag left (side 1) and right rows and union them onto one
    * `(keys, __ts, __side, __r, __l)` timeline — the shared substrate
    * all three directions window over.
    */
  private def taggedUnion(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      rightPayloadCols: Seq[String],
      inclusive: Boolean,
  ): (DataFrame, Seq[String]) = {
    require(keyCols.nonEmpty, "asof join needs at least one equi-key")
    val leftCols = left.columns.toSeq
    val outNames = "asof_ts" +: rightPayloadCols.map("asof_" + _)
    require(
      !leftCols.exists(outNames.contains),
      s"left columns collide with as-of output names: ${leftCols.intersect(outNames).mkString(",")}",
    )
    // at equal ts: inclusive → right sorts BEFORE left (match visible),
    // strict → right sorts AFTER left (match invisible). The rule is
    // direction-agnostic: the forward scan runs ts-DESC, where side 0
    // still places the equal-ts right ahead of the left.
    val rightSide = if (inclusive) 0 else 2
    val rStruct = struct(
      col(rightTsCol).as("__ats") +: rightPayloadCols.map(col): _*,
    )
    val rStructType = right.select(rStruct.as("__r")).schema("__r").dataType
    val lStruct = struct(leftCols.map(col): _*)
    val lStructType = left.select(lStruct.as("__l")).schema("__l").dataType

    val taggedL = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTsCol).as("__ts"),
        lit(1).as("__side"),
        lit(null).cast(rStructType).as("__r"),
        lStruct.as("__l"),
      ): _*,
    )
    // a NULL right timestamp satisfies no as-of predicate, but in the
    // ascending backward scan NULLs sort FIRST and would become the
    // running match for every subsequent left row — drop them here
    val taggedR = right
      .where(col(rightTsCol).isNotNull)
      .select(
        keyCols.map(col) ++ Seq(
          col(rightTsCol).as("__ts"),
          lit(rightSide).as("__side"),
          rStruct.as("__r"),
          lit(null).cast(lStructType).as("__l"),
        ): _*,
      )
    (taggedL.unionByName(taggedR), leftCols)
  }

  /** Per-key timeline scan: forward runs DESCENDING (running last =
    * smallest qualifying right ts); side/tie ordering is shared — at
    * equal (ts, side) the LARGEST right payload struct wins.
    */
  private def timelineWindow(keyCols: Seq[String], forward: Boolean) = {
    val tsOrder = if (forward) col("__ts").desc else col("__ts").asc
    Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(tsOrder, col("__side"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
  }

  private def selectAsofOutput(
      matched: DataFrame,
      leftCols: Seq[String],
      rightPayloadCols: Seq[String],
  ): DataFrame = {
    // a NULL left timestamp satisfies no as-of predicate either; the
    // forward (descending) scan sorts NULLs LAST, where the running
    // match is the key's smallest right ts — null it out (the left row
    // itself survives: left-join semantics)
    val m = when(col("__ts").isNotNull, col("__m"))
    matched.select(
      leftCols.map(c => col(s"__l.$c").as(c)) ++
        (m.getField("__ats").as("asof_ts") +:
          rightPayloadCols.map(c => m.getField(c).as(s"asof_$c"))): _*,
    )
  }
}
