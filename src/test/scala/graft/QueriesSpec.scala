package graft

/** Every SparkEntry query must run green at sf0.001; oracle-backed
  * queries must be non-empty (the driver hash-compares them at
  * sf0.01 — see tools/check_oracle.py for the local mirror).
  */
class QueriesSpec extends SparkTestBase {

  test("entry(): flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q131's driver-side fixture renderer matches the q122 column recipe byte-for-byte") {
    // the WARC seam gate re-renders the planted corpus in Scala; any
    // drift from the column expressions would silently change what
    // q131 feeds the pipeline relative to q122's oracle
    SparkEntry.q122PlantedPages(spark, Sf0001)
      .select("doc_id", "html", "url")
      .collect()
      .foreach { r =>
        val id = r.getLong(0)
        assert(r.getString(1) == SparkEntry.q122HtmlScala(id), s"html drift at doc $id")
        assert(r.getString(2) == SparkEntry.q122UrlScala(id), s"url drift at doc $id")
      }
  }

  test("every oracle key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, Sf0001)
      val n = df.count()
      assert(n >= 0)
      if (SparkEntry.oracleSql.contains(name))
        assert(n > 0, s"oracle-compared query $name returned 0 rows")
    }
  }
}
