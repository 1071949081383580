package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` for every SparkEntry query — the
  * plan-review loop: check filter/projection pushdown reaches the
  * parquet scans, small sides broadcast, and whole-stage codegen spans
  * stay wide. Run: `sbt "runMain graft.tools.ExplainAll [sfDir] [out]"`.
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("/tmp/explain_all.txt")
    val spark = SparkSession
      .builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      sb.append(s"\n============================== $name\n")
      try {
        val df = fn(spark, sfDir)
        sb.append(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode,
        ))
      } catch {
        case e: Throwable => sb.append(s"EXPLAIN FAILED: ${e.getMessage}\n")
      }
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
