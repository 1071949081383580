package graft

import org.apache.spark.sql.functions._

/** The shared plant-offset convention ([[SparkEntry.plantUnit]]):
  * every gate that plants synthetic ids over a scale-dir table
  * (q171/q176/q180/q184/q186/q187/q188) derives its offset unit from
  * the table's own max id — the smallest multiple of 1,000,000
  * strictly greater than it — so planted roles (`id + r·unit`) can
  * never collide with base ids at ANY scale dir. The old fixed
  * `+1e6` convention was silently wrong the day a dir reached 1M
  * rows: q184's leak predicate (`neighbor_id >= offset`) would have
  * started flagging real corpus rows as filter leaks. This spec pins
  * the closed form the DuckDB oracles mirror
  * (`((max(id) // 1000000) + 1) * 1000000`) and the no-collision
  * property the gates' join/leak predicates rely on.
  */
class PlantOffsetSpec extends SparkTestBase {
  import spark.implicits._

  private def unitOf(maxId: Long): Long =
    SparkEntry.plantUnit(Seq(0L, maxId / 2, maxId).toDF("id"), "id")

  test("unit is the legacy 1e6 below 1M ids — driver-SF plants unchanged") {
    assert(unitOf(0L) == 1000000L)
    assert(unitOf(499L) == 1000000L) // sf0.01 embeddings/documents
    assert(unitOf(4999L) == 1000000L) // sf0.1 documents
    assert(unitOf(999999L) == 1000000L)
  }

  test("unit clears the max id at every scale — including the boundary the old convention broke at") {
    // a base id EQUAL to 1e6 is exactly where `+1e6` plants collided
    assert(unitOf(1000000L) == 2000000L)
    assert(unitOf(2345678L) == 3000000L)
    assert(unitOf(999999999L) == 1000000000L)
    for (mx <- Seq(0L, 1L, 999999L, 1000000L, 1000001L, 54321987L)) {
      val u = unitOf(mx)
      assert(u > mx, s"unit must clear the max id: max $mx unit $u")
      assert(u % 1000000L == 0L, s"unit stays a 1e6 multiple (oracle mirror): $u")
      // the DuckDB oracle closed form, stated as the contract
      assert(u == (mx / 1000000L + 1L) * 1000000L)
      // role ranges are disjoint from the base ids AND from each other
      // for every multiple the gates use (q171 walks up to 5·unit)
      for (r <- 1 to 5) {
        assert(r * u > mx, s"role $r must not collide with base ids")
        assert(r * u + mx < (r + 1) * u, s"role $r must not bleed into role ${r + 1}")
      }
    }
  }

  test("null-safe: an empty table yields the base unit") {
    val empty = Seq.empty[Long].toDF("id")
    assert(SparkEntry.plantUnit(empty, "id") == 1000000L)
  }

  test("the gates' tables at the bundled scale dir derive a unit above their max id") {
    val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val uE = SparkEntry.plantUnit(emb, "vec_id")
    val uD = SparkEntry.plantUnit(docs, "doc_id")
    val mxE = emb.agg(max($"vec_id")).head().getLong(0)
    val mxD = docs.agg(max($"doc_id")).head().getLong(0)
    assert(uE > mxE && uD > mxD)
  }
}
