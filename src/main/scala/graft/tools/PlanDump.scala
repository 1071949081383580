package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump the formatted physical plan of NAMED declared queries, one
  * file per query, for the optimization-round evidence trail
  * (`plans/rNN/<query>_{before,after}.txt`). Unlike [[ExplainAll]]
  * (the curated PLANS.md set), this takes the query list and output
  * dir from the command line so a round can snapshot exactly the
  * queries it touches.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> q1 q2 …
  *
  * Note: operators that materialize internally (localCheckpoint /
  * parquet-boundary gates) return LogicalRDD-backed frames — their
  * interesting plans are internal stages; for those the per-stage
  * plans quoted in OPTIMIZATION notes come from targeted explains of
  * the operator faces, not from this tool.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: PlanDump <sfDir> <outDir> <suffix> <query>...")
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val names = args.drop(3).toSeq
    java.nio.file.Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted")).trim
      java.nio.file.Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), txt + "\n")
      println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
