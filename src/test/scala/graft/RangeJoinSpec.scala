package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val anchors = Seq(
    (1L, "u1", ts("2024-01-01 10:10:00")),
    (2L, "u1", ts("2024-01-01 12:00:00")),
    (3L, "u2", ts("2024-01-01 10:10:00")),
  ).toDF("anchor_id", "user", "t")

  private lazy val hits = Seq(
    (10L, "u1", ts("2024-01-01 10:00:00")), // exactly at the -10min bound
    (11L, "u1", ts("2024-01-01 10:05:30")),
    (12L, "u1", ts("2024-01-01 10:10:00")), // exactly at the anchor (upper bound)
    (13L, "u1", ts("2024-01-01 10:10:01")), // 1s past → out
    (14L, "u1", ts("2024-01-01 09:59:59")), // 1s early → out
    (15L, "u2", ts("2024-01-01 10:05:00")), // other key
  ).toDF("hit_id", "user", "ht")

  private val tenMin = 600L * 1000000L

  test("inclusive bounds, key isolation, exactly-once pairs") {
    val out = RangeJoin
      .intervalJoin(anchors, hits, Seq("user"), "t", "ht", -tenMin, 0L, Seq("hit_id"))
      .select($"anchor_id", $"right_hit_id")
      .as[(Long, Long)]
      .collect()
      .toSeq
    val expected = Seq((1L, 10L), (1L, 11L), (1L, 12L), (3L, 15L))
    assert(out.sorted == expected.sorted, s"got: ${out.sorted}")
    assert(out.size == out.distinct.size, "bin covering must not duplicate pairs")
  }

  test("agrees with the naive inequality join on denser data") {
    val rng = new scala.util.Random(5)
    val base = ts("2024-01-01 00:00:00").getTime
    val l = (1 to 200).map(i =>
      (i.toLong, s"k${rng.nextInt(5)}", new Timestamp(base + rng.nextInt(7200) * 1000L)),
    ).toDF("anchor_id", "user", "t")
    val r = (1 to 400).map(i =>
      (i.toLong, s"k${rng.nextInt(5)}", new Timestamp(base + rng.nextInt(7200) * 1000L)),
    ).toDF("hit_id", "user", "ht")
    val fast = RangeJoin
      .intervalJoin(l, r, Seq("user"), "t", "ht", -300L * 1000000L, 120L * 1000000L, Seq("hit_id"))
      .select($"anchor_id", $"right_hit_id").as[(Long, Long)].collect().toSet
    val naive = l.as("l")
      .join(r.as("r"), $"l.user" === $"r.user" &&
        unix_micros($"r.ht").between(
          unix_micros($"l.t") - 300L * 1000000L,
          unix_micros($"l.t") + 120L * 1000000L))
      .select($"l.anchor_id", $"r.hit_id").as[(Long, Long)].collect().toSet
    assert(fast == naive, s"missing=${(naive -- fast).take(5)} extra=${(fast -- naive).take(5)}")
  }

  test("plan shape: equi-join on (key, bin) — no nested-loop, no cartesian") {
    val plan = RangeJoin
      .intervalJoin(anchors, hits, Seq("user"), "t", "ht", -tenMin, 0L, Seq("hit_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must stay an equi-join:\n$plan")
  }
}
