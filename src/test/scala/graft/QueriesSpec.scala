package graft

/** Every SparkEntry query must run green at sf0.001; oracle-backed
  * queries must be non-empty (the driver hash-compares them at
  * sf0.01 — see tools/check_oracle.py for the local mirror).
  */
class QueriesSpec extends SparkTestBase {

  test("entry(): flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
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
