package graft

import org.apache.spark.sql.functions._

/** Every driver query must DEGRADE, not crash, on empty input — at
  * corpus scale, empty slices are routine (a filter that drops
  * everything, an empty stratum, a new partition). Each queries()
  * entry runs against a schema-identical EMPTY copy of the testdata
  * tables and must return a well-formed (usually 0-row) result.
  */
class DegenerateInputSpec extends SparkTestBase {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_sf").toString
    val tables = Seq(
      "region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings",
    )
    tables.foreach { t =>
      // via Tables.load: the raw events parquet is TIMESTAMP(NANOS),
      // which a plain read rejects; the mirror gets the loaded schema
      graft.sources.Tables
        .load(spark, Sf0001, t)
        .limit(0)
        .coalesce(1)
        .write
        .mode("overwrite")
        .parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every query survives fully empty tables") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        fn(spark, emptyDir).count() // just must not throw
      } catch {
        case e: Throwable =>
          failures += ((name, Option(e.getMessage).getOrElse(e.getClass.getName).take(120)))
      }
    }
    assert(failures.isEmpty, "queries crashed on empty input:\n" +
      failures.map { case (n, m) => s"  $n: $m" }.mkString("\n"))
  }
}
