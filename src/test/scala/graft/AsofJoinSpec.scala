package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsofJoin

class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val trades = Seq(
    (1L, "A", ts("2024-01-01 10:00:05"), 100.0),
    (2L, "A", ts("2024-01-01 10:00:10"), 101.0),
    (3L, "B", ts("2024-01-01 10:00:03"), 50.0),
    (4L, "C", ts("2024-01-01 10:00:01"), 7.0), // no quote for C at all
  ).toDF("trade_id", "sym", "t", "price")

  private lazy val quotes = Seq(
    ("A", ts("2024-01-01 10:00:00"), 99.0),
    ("A", ts("2024-01-01 10:00:05"), 99.5), // == trade 1's ts
    ("A", ts("2024-01-01 10:00:09"), 99.9),
    ("B", ts("2024-01-01 10:00:04"), 48.0), // after B's only trade
  ).toDF("sym", "qt", "bid")

  test("backward inclusive: latest right row at-or-before each left row; unmatched → null") {
    val out = AsofJoin
      .asofBackward(trades, quotes, Seq("sym"), "t", "qt", Seq("bid"))
      .orderBy("trade_id")
      .collect()
    assert(out.length == 4, "every left row survives (left-join semantics)")
    assert(out(0).getAs[Double]("asof_bid") == 99.5, "equal ts matches when inclusive")
    assert(out(1).getAs[Double]("asof_bid") == 99.9)
    assert(out(2).isNullAt(out(2).fieldIndex("asof_bid")), "B's quote is after its trade")
    assert(out(3).isNullAt(out(3).fieldIndex("asof_bid")), "C has no quotes")
    // left columns pass through untouched
    assert(out(0).getAs[Double]("price") == 100.0 && out(0).getAs[String]("sym") == "A")
  }

  test("strict (exclusive): simultaneous right rows are invisible") {
    val out = AsofJoin
      .asofBackward(trades, quotes, Seq("sym"), "t", "qt", Seq("bid"), inclusive = false)
      .orderBy("trade_id")
      .collect()
    assert(out(0).getAs[Double]("asof_bid") == 99.0, "10:00:05 quote excluded under strict <")
    assert(out(1).getAs[Double]("asof_bid") == 99.9)
  }

  test("tolerance bounds the lookback window") {
    val out = AsofJoin
      .asofBackward(trades, quotes, Seq("sym"), "t", "qt", Seq("bid"),
        toleranceMicros = Some(2L * 1000000L))
      .orderBy("trade_id")
      .collect()
    assert(out(0).getAs[Double]("asof_bid") == 99.5, "0s gap within 2s tolerance")
    assert(out(1).getAs[Double]("asof_bid") == 99.9, "1s gap within 2s tolerance")
    val wide = AsofJoin
      .asofBackward(trades, quotes, Seq("sym"), "t", "qt", Seq("bid"),
        toleranceMicros = Some(0L))
      .orderBy("trade_id")
      .collect()
    assert(wide(1).isNullAt(wide(1).fieldIndex("asof_bid")), "1s gap fails 0s tolerance")
    assert(wide(0).getAs[Double]("asof_bid") == 99.5, "exact-ts match passes 0 tolerance")
  }

  test("ties at equal right ts resolve deterministically (largest payload struct wins)") {
    val dup = Seq(
      ("A", ts("2024-01-01 10:00:05"), 99.5),
      ("A", ts("2024-01-01 10:00:05"), 99.7),
    ).toDF("sym", "qt", "bid")
    val got = (1 to 3).map { _ =>
      AsofJoin
        .asofBackward(trades.where($"trade_id" === 1), dup, Seq("sym"), "t", "qt", Seq("bid"))
        .head()
        .getAs[Double]("asof_bid")
    }
    assert(got.distinct == Seq(99.7), s"max struct must win every run: $got")
  }

  test("forward inclusive: earliest right row at-or-after each left row") {
    val out = AsofJoin
      .asofForward(trades, quotes, Seq("sym"), "t", "qt", Seq("bid"))
      .orderBy("trade_id")
      .collect()
    assert(out(0).getAs[Double]("asof_bid") == 99.5, "equal ts matches when inclusive")
    assert(out(1).isNullAt(out(1).fieldIndex("asof_bid")), "no A quote after 10:00:10")
    assert(out(2).getAs[Double]("asof_bid") == 48.0, "B's quote is 1s ahead")
    assert(out(3).isNullAt(out(3).fieldIndex("asof_bid")), "C has no quotes")
  }

  test("forward strict + tolerance") {
    val strict = AsofJoin
      .asofForward(trades, quotes, Seq("sym"), "t", "qt", Seq("bid"), inclusive = false)
      .orderBy("trade_id")
      .collect()
    assert(strict(0).getAs[Double]("asof_bid") == 99.9,
      "10:00:05 quote excluded under strict >; next is 10:00:09")
    val tol = AsofJoin
      .asofForward(trades, quotes, Seq("sym"), "t", "qt", Seq("bid"),
        toleranceMicros = Some(0L))
      .orderBy("trade_id")
      .collect()
    assert(tol(0).getAs[Double]("asof_bid") == 99.5, "exact-ts match passes 0 tolerance")
    assert(tol(2).isNullAt(tol(2).fieldIndex("asof_bid")), "1s-ahead quote fails 0 tolerance")
  }

  test("nearest: closer side wins, equidistant goes backward, one-sided falls through") {
    val out = AsofJoin
      .asofNearest(trades, quotes, Seq("sym"), "t", "qt", Seq("bid"))
      .orderBy("trade_id")
      .collect()
    assert(out(0).getAs[Double]("asof_bid") == 99.5, "distance 0 both ways → backward (same row)")
    assert(out(1).getAs[Double]("asof_bid") == 99.9, "1s back vs nothing forward")
    assert(out(2).getAs[Double]("asof_bid") == 48.0, "nothing back, 1s forward")
    assert(out(3).isNullAt(out(3).fieldIndex("asof_bid")), "no quotes either way")
    // genuinely two-sided: 10:00:07 trade is 2s from 10:00:05 and 2s from
    // 10:00:09 → equidistant → backward (99.5)
    val mid = Seq((9L, "A", ts("2024-01-01 10:00:07"), 1.0))
      .toDF("trade_id", "sym", "t", "price")
    val got = AsofJoin
      .asofNearest(mid, quotes, Seq("sym"), "t", "qt", Seq("bid")).head()
    assert(got.getAs[Double]("asof_bid") == 99.5, "equidistant resolves backward")
    val near = Seq((10L, "A", ts("2024-01-01 10:00:08"), 1.0))
      .toDF("trade_id", "sym", "t", "price")
    val got2 = AsofJoin
      .asofNearest(near, quotes, Seq("sym"), "t", "qt", Seq("bid")).head()
    assert(got2.getAs[Double]("asof_bid") == 99.9, "1s forward beats 3s backward")
  }

  test("randomized: all three directions match an in-memory reference under heavy ties") {
    val baseMs = ts("2024-01-01 10:00:00").getTime
    (1 to 5).foreach { seed =>
      val rng = new scala.util.Random(seed)
      // 3 keys × 20 timestamps × 30 rows per side → dense collisions
      // and equal-ts ties on both sides
      val lefts = (1 to 30).map(i =>
        (i.toLong, s"K${rng.nextInt(3)}", new Timestamp(baseMs + rng.nextInt(20) * 1000L)))
      val rights = (1 to 30).map(i =>
        (100L + i, s"K${rng.nextInt(3)}", new Timestamp(baseMs + rng.nextInt(20) * 1000L),
          rng.nextInt(5).toDouble))
      val lDf = lefts.toDF("lid", "k", "t")
      val rDf = rights.toDF("rid", "k", "qt", "v")

      // reference tie rule = the operator contract: qualifying set,
      // then max by (ts, payload struct) for backward / min ts with
      // max struct for forward — both are max by the lexicographic
      // (±ts, rid, v) tuple
      def bwRef(k: String, lt: Long) = rights
        .filter(r => r._2 == k && r._3.getTime <= lt)
        .sortBy(r => (r._3.getTime, r._1, r._4)).lastOption
      def fwRef(k: String, lt: Long) = rights
        .filter(r => r._2 == k && r._3.getTime >= lt)
        .sortBy(r => (-r._3.getTime, r._1, r._4)).lastOption
      def nearRef(k: String, lt: Long) = (bwRef(k, lt), fwRef(k, lt)) match {
        case (Some(b), Some(f)) =>
          if (lt - b._3.getTime <= f._3.getTime - lt) Some(b) else Some(f)
        case (b, f) => b.orElse(f)
      }

      def run(dir: String) = {
        val fn = dir match {
          case "b" => AsofJoin.asofBackward _
          case "f" => AsofJoin.asofForward _
          case _ => AsofJoin.asofNearest _
        }
        fn(lDf, rDf, Seq("k"), "t", "qt", Seq("rid", "v"), true, None)
          .select(col("lid"), col("asof_rid"))
          .collect()
          .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
          .toMap
      }
      val (gotB, gotF, gotN) = (run("b"), run("f"), run("n"))
      lefts.foreach { case (lid, k, lts) =>
        assert(gotB(lid) == bwRef(k, lts.getTime).map(_._1).getOrElse(-1L),
          s"seed=$seed backward lid=$lid")
        assert(gotF(lid) == fwRef(k, lts.getTime).map(_._1).getOrElse(-1L),
          s"seed=$seed forward lid=$lid")
        assert(gotN(lid) == nearRef(k, lts.getTime).map(_._1).getOrElse(-1L),
          s"seed=$seed nearest lid=$lid")
      }
    }
  }

  test("null timestamps match nothing in any direction (rows survive, left-join)") {
    // a null RIGHT ts sorts first in the ascending backward scan and
    // would become the running match for every later left row; a null
    // LEFT ts sorts last in the descending forward scan and would
    // adopt the key's smallest right ts — both must yield NO match
    val l = Seq(
      (1L, "A", ts("2024-01-01 10:00:05")),
      (2L, "A", null.asInstanceOf[Timestamp]),
    ).toDF("lid", "k", "t")
    val r = Seq(
      ("A", null.asInstanceOf[Timestamp], 1.0), // must never match
      ("A", ts("2024-01-01 10:00:02"), 2.0),
      ("A", ts("2024-01-01 10:00:07"), 3.0),
    ).toDF("k", "rt", "v")
    def byLid(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("lid").collect().map(row =>
        (row.getLong(0), if (row.isNullAt(row.fieldIndex("asof_v"))) None
          else Some(row.getAs[Double]("asof_v"))))
    val back = byLid(AsofJoin.asofBackward(l, r, Seq("k"), "t", "rt", Seq("v")))
    assert(back.toSeq == Seq((1L, Some(2.0)), (2L, None)), s"backward: ${back.toSeq}")
    val fwd = byLid(AsofJoin.asofForward(l, r, Seq("k"), "t", "rt", Seq("v")))
    assert(fwd.toSeq == Seq((1L, Some(3.0)), (2L, None)), s"forward: ${fwd.toSeq}")
    val near = byLid(AsofJoin.asofNearest(l, r, Seq("k"), "t", "rt", Seq("v")))
    assert(near.toSeq == Seq((1L, Some(3.0)), (2L, None)), s"nearest: ${near.toSeq}")
    // a left key whose ONLY right rows have null ts behaves like an
    // unmatched key, not a crash or a phantom match
    val lOnly = Seq((3L, "B", ts("2024-01-01 10:00:01"))).toDF("lid", "k", "t")
    val rNull = Seq(("B", null.asInstanceOf[Timestamp], 9.0)).toDF("k", "rt", "v")
    val got = byLid(AsofJoin.asofBackward(lOnly, rNull, Seq("k"), "t", "rt", Seq("v")))
    assert(got.toSeq == Seq((3L, None)), s"null-only right side: ${got.toSeq}")
  }

  test("plan shape: exactly one exchange — no range-join explosion") {
    val plan = AsofJoin
      .asofBackward(trades, quotes, Seq("sym"), "t", "qt", Seq("bid"))
      .queryExecution
      .executedPlan
      .toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected the single union+window shuffle, got $exchanges:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }
}
