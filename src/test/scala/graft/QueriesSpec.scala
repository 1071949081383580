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
      if (SparkEntry.oracleSql.contains(name)) {
        assert(n > 0, s"oracle-compared query $name returned 0 rows")
        // The driver comparator canonicalizes with pandas sort_values,
        // which cannot hash array/map/struct cells (r18 q181 shipped
        // red on an array column): oracle-checked outputs are
        // scalar-only. Project nested values through array_join /
        // element_at / to_json before returning.
        val nested = df.schema.fields.collect {
          case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] ||
            f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType] ||
            f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType] =>
            s"${f.name}: ${f.dataType.simpleString}"
        }
        assert(nested.isEmpty,
          s"oracle-compared query $name returns non-scalar columns ${nested.mkString(", ")} " +
            "— the driver comparator cannot canonicalize them")
      }
    }
  }
}
