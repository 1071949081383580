package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Physical-layout operators: multi-column clustering for data
  * skipping. At 100 TB the scan you DON'T do is the fastest one —
  * parquet min/max (and any lakehouse file-stats index) prunes files
  * only if rows with nearby key values sit in the same files. A sort
  * by (a, b) clusters a perfectly and b not at all; the Z-order curve
  * trades a little of a's locality for b's, so point/range filters on
  * EITHER column skip most files.
  */
object Layout {

  /** 64-bit Morton key of two non-negative integer columns (low 32
    * bits each, a→even positions, b→odd). Codegen'd expression.
    */
  def zValue(a: Column, b: Column): Column =
    org.apache.spark.sql.graftext.ZOrderValue.zValue(a.cast("long"), b.cast("long"))

  /** Re-layout by Z-order: range-partition + sort within partitions on
    * the Morton key of (`colA`, `colB`). Write the result with any
    * file sink and both columns' min/max file stats become selective.
    * One shuffle (the range exchange) — the price of any re-layout.
    *
    * `numPartitions > 0` pins the output file count; 0 uses the
    * session default, which AQE may COALESCE on small data — fewer,
    * larger z-ranges keep the curve's locality but prune coarser, so
    * pin the count when the file layout itself is the product.
    */
  def zOrderLayout(df: DataFrame, colA: String, colB: String, numPartitions: Int = 0): DataFrame = {
    val keyed = df.withColumn("__z", zValue(col(colA), col(colB)))
    val parted =
      if (numPartitions > 0) keyed.repartitionByRange(numPartitions, col("__z"))
      else keyed.repartitionByRange(col("__z"))
    parted.sortWithinPartitions(col("__z")).drop("__z")
  }
}
