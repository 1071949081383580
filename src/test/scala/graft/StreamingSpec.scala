package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.EventStreams

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  /** Events re-encoded with µs timestamps so the file stream source
    * sees a plain TimestampType schema.
    */
  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("graft-events").toString
    Tables.events(spark, Sf0001).coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming hourly rollup equals batch rollup on bounded input") {
    val batch = EventStreams
      .hourlyRollup(Tables.events(spark, Sf0001))
      .select($"hour", $"event_type", $"n_events", $"sum_value".cast("string").as("sum_value"))
      .collect()
      .map(_.toSeq)
      .toSet

    val stream = spark.readStream
      .schema(spark.read.parquet(eventsDir).schema)
      .parquet(eventsDir)
    val q = EventStreams
      .hourlyRollupStream(stream, watermark = "365 days")
      .writeStream
      .format("memory")
      .queryName("hourly_stream")
      .outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark
        .table("hourly_stream")
        .select($"hour", $"event_type", $"n_events", $"sum_value".cast("string").as("sum_value"))
        .collect()
        .map(_.toSeq)
        .toSet
      assert(streamed == batch, s"stream=${streamed.size} batch=${batch.size}")
    } finally q.stop()
  }

  test("streaming sessionization equals batch sessionize (single microbatch)") {
    val batch = EventStreams
      .sessionize(Tables.events(spark, Sf0001))
      .select($"event_id", $"session_seq")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

    val stream = spark.readStream
      .schema(spark.read.parquet(eventsDir).schema)
      .parquet(eventsDir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventStreams.Event]
    val q = EventStreams
      .sessionizeStream(stream, expireState = false) // bounded input: quiesce for processAllAvailable
      .writeStream
      .format("memory")
      .queryName("sessions_stream")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark
        .table("sessions_stream")
        .select($"event_id", $"session_seq")
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      assert(streamed.size == batch.size)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("event-time-timeout sessionization equals batch (state pruned by watermark, not wall clock)") {
    val batch = EventStreams
      .sessionize(Tables.events(spark, Sf0001))
      .select($"event_id", $"session_seq")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

    val stream = spark.readStream
      .schema(spark.read.parquet(eventsDir).schema)
      .parquet(eventsDir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventStreams.Event]
    val q = EventStreams
      .sessionizeStreamEventTime(stream, watermarkDelay = "365 days")
      .writeStream
      .format("memory")
      .queryName("sessions_et_stream")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark
        .table("sessions_et_stream")
        .select($"event_id", $"session_seq")
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      assert(streamed.size == batch.size)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming as-of join equals batch asofBackward (single microbatch, raw ties)") {
    val e = Tables.events(spark, Sf0001)
    val purchases = e
      .where($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value")
    val views = e
      .where($"event_type" === "view")
      .select($"event_id", $"user_id", $"ts", $"value")
    // batch reference on RAW views: the batch tie rule (largest
    // (ts, event_id, value) struct at equal ts) is exactly the
    // stream's in-batch overwrite order
    val batch = graft.operators.AsofJoin
      .asofBackward(purchases, views, Seq("user_id"), "ts", "ts", Seq("event_id", "value"))
      .select($"event_id", $"asof_event_id", $"asof_value".cast("string"))
      .collect()
      .map(r => r.getLong(0) -> ((if (r.isNullAt(1)) -1L else r.getLong(1)), r.getString(2)))
      .toMap

    def sideStream(eventType: String) = spark.readStream
      .schema(spark.read.parquet(eventsDir).schema)
      .parquet(eventsDir)
      .where($"event_type" === eventType)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventStreams.Event]
    val q = EventStreams
      .asofBackwardStream(sideStream("purchase"), sideStream("view"),
        watermarkDelay = "365 days")
      .writeStream
      .format("memory")
      .queryName("asof_stream")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark
        .table("asof_stream")
        .select($"event_id", $"asof_event_id", $"asof_value".cast("string"))
        .collect()
        .map(r => r.getLong(0) -> ((if (r.isNullAt(1)) -1L else r.getLong(1)), r.getString(2)))
        .toMap
      assert(streamed.size == batch.size, s"${streamed.size} vs ${batch.size}")
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming as-of join: out-of-order left never matches a right from its future") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:00:00").getTime
    def ev(id: Long, offsetSec: Long, tpe: String) =
      EventStreams.Event(id, new java.sql.Timestamp(t0 + offsetSec * 1000), 1L, tpe, id.toDouble)
    val lefts = MemoryStream[EventStreams.Event](spark)
    val rights = MemoryStream[EventStreams.Event](spark)
    val q = EventStreams
      .asofBackwardStream(
        lefts.toDS(), rights.toDS(), watermarkDelay = "1 hour")
      .writeStream.format("memory").queryName("asof_ooo_stream").outputMode("append").start()
    try {
      // batch 1: a right at t0+10s advances the state
      rights.addData(ev(100L, 10, "view"))
      q.processAllAvailable()
      // batch 2: a LATE left at t0+5s (before the stored right) plus an
      // in-order left at t0+20s (after it)
      lefts.addData(ev(1L, 5, "purchase"), ev(2L, 20, "purchase"))
      q.processAllAvailable()
      val got = spark.table("asof_ooo_stream")
        .select($"event_id", $"asof_event_id")
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      assert(got == Map(1L -> None, 2L -> Some(100L)),
        s"late left must fall back to no-match, not a forward-in-time right: $got")
    } finally q.stop()
  }

  test("asofBackwardStreamTws: same hits as the fMGWS face, and chains a downstream windowed aggregation") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:00:00").getTime
    def ev(id: Long, offsetSec: Long, tpe: String) =
      EventStreams.Event(id, new java.sql.Timestamp(t0 + offsetSec * 1000), 1L, tpe, id.toDouble)
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // (a) raw hits: the exact out-of-order scenario the fMGWS spec
    // pins — the port must produce the same verdicts across triggers
    val lefts = MemoryStream[EventStreams.Event](spark)
    val rights = MemoryStream[EventStreams.Event](spark)
    val q = EventStreams
      .asofBackwardStreamTws(lefts.toDS(), rights.toDS(), watermarkDelay = "1 hour")
      .writeStream.format("memory").queryName("asof_tws_raw").outputMode("append").start()
    // (b) the chainability the port buys: as-of enrich → windowed
    // count of MATCHED hits, two stateful operators in ONE query —
    // an unsupported plan under flatMapGroupsWithState
    val lefts2 = MemoryStream[EventStreams.Event](spark)
    val rights2 = MemoryStream[EventStreams.Event](spark)
    val q2 = EventStreams
      .asofBackwardStreamTws(lefts2.toDS(), rights2.toDS(), watermarkDelay = "10 seconds")
      .toDF()
      .where($"asof_event_id".isNotNull)
      .groupBy(window($"emit_ts", "1 minute"))
      .count()
      .writeStream.format("memory").queryName("asof_tws_agg").outputMode("append").start()
    try {
      rights.addData(ev(100L, 10, "view"))
      q.processAllAvailable()
      lefts.addData(ev(1L, 5, "purchase"), ev(2L, 20, "purchase"))
      q.processAllAvailable()
      val got = spark.table("asof_tws_raw")
        .select($"event_id", $"asof_event_id")
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      assert(got == Map(1L -> None, 2L -> Some(100L)), s"tws hits: $got")
      assert(q.lastProgress.stateOperators
        .exists(_.operatorName.toLowerCase.contains("transformwithstate")),
        q.lastProgress.stateOperators.map(_.operatorName).mkString(","))

      rights2.addData(ev(100L, 10, "view"))
      q2.processAllAvailable()
      lefts2.addData(ev(1L, 5, "purchase"), ev(2L, 20, "purchase"))
      q2.processAllAvailable()
      // flush: a far-future left advances the watermark past the
      // window end so the append-mode aggregation finalizes it
      lefts2.addData(ev(9L, 3600, "purchase"))
      q2.processAllAvailable()
      val wins = spark.table("asof_tws_agg")
        .select($"window.start", $"count")
        .collect()
        .map(r => (r.getTimestamp(0).getTime - t0) / 1000 -> r.getLong(1))
        .toMap
      // the only CLOSED window holds left 2 (matched); the late left 1
      // was filtered as unmatched, the flush left's window stays open
      assert(wins == Map(0L -> 1L), s"windows: $wins")
      assert(q2.lastProgress.stateOperators.length == 2,
        s"expected asof TWS + windowed agg chained: " +
          q2.lastProgress.stateOperators.map(_.operatorName).mkString(","))
    } finally {
      q.stop(); q2.stop()
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("sessionizeStreamTws: stream equals batch + fMGWS across triggers, and chains a downstream windowed aggregation") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:00:00").getTime
    def ev(id: Long, offsetSec: Long, user: Long) =
      EventStreams.Event(id, new java.sql.Timestamp(t0 + offsetSec * 1000), user, "view", id.toDouble)
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // user 1: two events inside one 30-min gap, a third past it (new
    // session); user 2: one event — split across two triggers
    val fixture = Seq(ev(1L, 0, 1L), ev(2L, 10, 1L), ev(4L, 5, 2L), ev(3L, 2000, 1L))
    val in = MemoryStream[EventStreams.Event](spark)
    val q = EventStreams
      .sessionizeStreamTws(in.toDS(), gapSeconds = 1800L, watermarkDelay = "1 hour")
      .writeStream.format("memory").queryName("sess_tws_raw").outputMode("append").start()
    // the chainability the port buys: sessionize → windowed event
    // count, two stateful operators in ONE query — an unsupported
    // plan under flatMapGroupsWithState
    val in2 = MemoryStream[EventStreams.Event](spark)
    val q2 = EventStreams
      .sessionizeStreamTws(in2.toDS(), gapSeconds = 1800L, watermarkDelay = "10 seconds")
      .toDF()
      .groupBy(window($"emit_ts", "1 minute"))
      .count()
      .writeStream.format("memory").queryName("sess_tws_agg").outputMode("append").start()
    try {
      in.addData(fixture(0), fixture(1), fixture(2))
      q.processAllAvailable()
      in.addData(fixture(3))
      q.processAllAvailable()
      val got = spark.table("sess_tws_raw")
        .select($"event_id", $"user_id", $"session_seq")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val expected = Set((1L, 1L, 1L), (2L, 1L, 1L), (4L, 2L, 1L), (3L, 1L, 2L))
      assert(got == expected, s"tws stream assignments: $got")
      // all three faces agree on the bounded fixture (shared step)
      val batchTws = EventStreams.sessionizeStreamTws(fixture.toDS(), 1800L)
        .collect().map(a => (a.event_id, a.user_id, a.session_seq)).toSet
      assert(batchTws == expected, s"tws batch face: $batchTws")
      val fmgws = EventStreams.sessionizeStream(fixture.toDS(), 1800L, expireState = false)
        .collect().map(a => (a.event_id, a.user_id, a.session_seq)).toSet
      assert(fmgws == expected, s"fMGWS face: $fmgws")
      assert(q.lastProgress.stateOperators
        .exists(_.operatorName.toLowerCase.contains("transformwithstate")),
        q.lastProgress.stateOperators.map(_.operatorName).mkString(","))

      in2.addData(fixture(0), fixture(1), fixture(2))
      q2.processAllAvailable()
      in2.addData(fixture(3))
      q2.processAllAvailable()
      // flush: a far-future event advances the watermark past both
      // windows so the append-mode aggregation finalizes them
      in2.addData(ev(9L, 7200, 1L))
      q2.processAllAvailable()
      val wins = spark.table("sess_tws_agg")
        .select($"window.start", $"count")
        .collect()
        .map(r => (r.getTimestamp(0).getTime - t0) / 1000 -> r.getLong(1))
        .toMap
      // window 0-60s holds events 1,2,4; window 1980-2040s holds
      // event 3; the flush event's own window stays open
      assert(wins == Map(0L -> 3L, 1980L -> 1L), s"windows: $wins")
      assert(q2.lastProgress.stateOperators.length == 2,
        s"expected sessionize TWS + windowed agg chained: " +
          q2.lastProgress.stateOperators.map(_.operatorName).mkString(","))
    } finally {
      q.stop(); q2.stop()
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("reaggregateByEventTime: two trigger cadences re-aggregate identically though emit_ts differs") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:00:00").getTime
    def ev(id: Long, offsetSec: Long, tpe: String, user: Long = 1L) =
      EventStreams.Event(id, new java.sql.Timestamp(t0 + offsetSec * 1000), user, tpe, id.toDouble)
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // input (identical across cadences): user-1 lefts l1@0, l2@5
    // (both forward-match r@10), l3@75 (unmatched); user-99 RIGHTS
    // f1@80 / f2@200 / f3@3600 advance the watermark without emitting
    val lefts = Seq(ev(1L, 0, "purchase"), ev(2L, 5, "purchase"), ev(3L, 75, "purchase"))
    val rights = Seq(ev(100L, 10, "view"),
      ev(900L, 80, "view", 99L), ev(901L, 200, "view", 99L), ev(902L, 3600, "view", 99L))
    def run(name: String, batches: Seq[(Seq[EventStreams.Event], Seq[EventStreams.Event])])
        : org.apache.spark.sql.DataFrame = {
      val ls = MemoryStream[EventStreams.Event](spark)
      val rs = MemoryStream[EventStreams.Event](spark)
      val q = EventStreams
        .asofForwardStreamTws(ls.toDS(), rs.toDS(), toleranceSeconds = 30,
          watermarkDelay = "10 seconds")
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try batches.foreach { case (l, r) =>
        if (l.nonEmpty) ls.addData(l)
        if (r.nonEmpty) rs.addData(r)
        q.processAllAvailable()
      } finally q.stop()
      spark.table(name)
    }
    try {
      // cadence A: everything except the final flush in one batch
      val a = run("reagg_a", Seq(
        (lefts, rights.take(3)),
        (Nil, Seq(rights(3)))))
      // cadence B: drip-fed — resolutions happen under DIFFERENT
      // watermarks, so clamped emit_ts values differ from cadence A
      val b = run("reagg_b", Seq(
        (lefts.take(2), Seq(rights(0), rights(1))),
        (Seq(lefts(2)), Seq(rights(2))),
        (Nil, Seq(rights(3)))))
      // same resolved hits either way
      def hits(df: org.apache.spark.sql.DataFrame) = df
        .select($"event_id", $"asof_event_id").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
      assert(hits(a) == hits(b) &&
        hits(a) == Set(1L -> Some(100L), 2L -> Some(100L), 3L -> None), s"${hits(a)} ${hits(b)}")
      // the caveat is REAL: the two cadences stamped different emit_ts
      def emits(df: org.apache.spark.sql.DataFrame) = df
        .select($"event_id", $"emit_ts").collect()
        .map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
      assert(emits(a) != emits(b),
        s"fixture must exhibit cadence-dependent emit_ts: ${emits(a)} vs ${emits(b)}")
      // ...and the carried-ts re-aggregation is cadence-invariant
      def re(df: org.apache.spark.sql.DataFrame) = EventStreams
        .reaggregateByEventTime(df, "ts", "1 minute", Seq("user_id"),
          Seq(count(lit(1)).as("n"),
            sum($"value".cast("decimal(18,6)")).as("total")),
          dedupIdCol = Some("event_id"))
        .collect().map(_.toSeq).toSet
      assert(re(a) == re(b), "re-aggregation on the carried ts must be cadence-invariant")
      assert(re(a).nonEmpty)
    } finally {
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("reaggregateSessions: two TWS cadences + sink retries replay to identical per-session rollups") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:00:00").getTime
    def ev(id: Long, offsetSec: Long, user: Long = 1L) =
      EventStreams.Event(id, new java.sql.Timestamp(t0 + offsetSec * 1000), user, "view", id.toDouble)
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // user-1: session 1 = e1@0, e2@60; session 2 = e3@4000, e4@4030
    // (always delivered in ONE batch — watermark expiry between
    // batches would legitimately restart ordinals, the documented
    // returns-after-expiry behavior); user-9's events span batches
    // in cadence B. NOTE sessionize emits assignments the moment a
    // row arrives, and rows passing the late-record filter satisfy
    // ts >= watermark — so unlike the as-of family's pending-state
    // resolutions, REAL emit stamps never diverge across cadences
    // here; the divergence this helper folds away comes from
    // at-least-once SINK retries re-landing rows with fresh stamps,
    // which the test synthesizes below.
    val evs = Seq(ev(1L, 0), ev(2L, 60), ev(3L, 4000), ev(4L, 4030),
      ev(900L, 8000, 9L), ev(901L, 20000, 9L))
    def run(name: String, batches: Seq[Seq[EventStreams.Event]])
        : org.apache.spark.sql.DataFrame = {
      val in = MemoryStream[EventStreams.Event](spark)
      val q = EventStreams
        .sessionizeStreamTws(in.toDS(), gapSeconds = 1800L, watermarkDelay = "10 seconds")
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try batches.foreach { b => in.addData(b); q.processAllAvailable() }
      finally q.stop()
      spark.table(name)
    }
    try {
      val a = run("sreagg_a", Seq(evs))
      val b = run("sreagg_b", Seq(evs.take(5), evs.drop(5)))
      def assigns(df: org.apache.spark.sql.DataFrame) = df
        .select($"event_id", $"user_id", $"session_seq").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(assigns(a) == assigns(b), "assignments themselves are cadence-invariant")
      // landed-sink divergence: cadence B's sink re-landed every other
      // row with a fresh emit stamp (at-least-once retry) — the replay
      // must fold the retries and never read emit_ts
      def re(df: org.apache.spark.sql.DataFrame) = EventStreams
        .reaggregateSessions(df).collect().map(_.toSeq).toSet
      val retries = b.where($"event_id" % 2 === 0).withColumn("emit_ts",
        org.apache.spark.sql.functions.expr("emit_ts + INTERVAL 2 MINUTES"))
      val (ra, rb) = (re(a), re(b.unionByName(retries)))
      assert(ra == rb, s"per-session replay must be cadence-invariant: $ra vs $rb")
      // closed-form: user 1 has two sessions of 2 events each
      // (row shape: user_id, session_seq, session_start, session_end, n_events)
      val u1 = ra.filter(_.head == 1L).map(r => (r(1), r(4))).toSet
      assert(u1 == Set((1L, 2L), (2L, 2L)), s"sessions: $ra")
    } finally {
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("streaming forward as-of join equals batch asofForward with tolerance (bounded input)") {
    val tolSec = 3600L
    // fixture = events + one far-future flush view (beyond tolerance of
    // every purchase, so it never matches) that advances the watermark
    // far enough for ALL lefts — including the no-match tail — to
    // resolve; used identically on both sides of the equivalence
    val base = Tables.events(spark, Sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val maxTs = base.agg(max($"ts")).head().getTimestamp(0)
    val flush = Seq(EventStreams.Event(
      999999999L, new java.sql.Timestamp(maxTs.getTime + 3 * tolSec * 1000), 1L, "view", 0.0)).toDF()
    val fixtureDir = Files.createTempDirectory("graft-asof-fwd").toString
    base.unionByName(flush).coalesce(1).write.mode("overwrite").parquet(fixtureDir)
    val fixture = spark.read.parquet(fixtureDir)

    val purchases = fixture
      .where($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value")
    val views = fixture
      .where($"event_type" === "view")
      .select($"event_id", $"user_id", $"ts", $"value")
    val batch = graft.operators.AsofJoin
      .asofForward(purchases, views, Seq("user_id"), "ts", "ts", Seq("event_id", "value"),
        toleranceMicros = Some(tolSec * 1000000L))
      .select($"event_id", $"asof_event_id", $"asof_value".cast("string"))
      .collect()
      .map(r => r.getLong(0) -> ((if (r.isNullAt(1)) -1L else r.getLong(1)), r.getString(2)))
      .toMap

    def sideStream(eventType: String) = spark.readStream
      .schema(fixture.schema)
      .parquet(fixtureDir)
      .where($"event_type" === eventType)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventStreams.Event]
    val q = EventStreams
      .asofForwardStream(sideStream("purchase"), sideStream("view"),
        toleranceSeconds = tolSec, watermarkDelay = "0 seconds")
      .writeStream
      .format("memory")
      .queryName("asof_fwd_stream")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark
        .table("asof_fwd_stream")
        .select($"event_id", $"asof_event_id", $"asof_value".cast("string"))
        .collect()
        .map(r => r.getLong(0) -> ((if (r.isNullAt(1)) -1L else r.getLong(1)), r.getString(2)))
        .toMap
      assert(streamed.size == batch.size, s"${streamed.size} vs ${batch.size}")
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming forward as-of: left resolves only when the watermark proves its match final") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:00:00").getTime
    def ev(id: Long, offsetSec: Long) =
      EventStreams.Event(id, new java.sql.Timestamp(t0 + offsetSec * 1000), 1L, "x", id.toDouble)
    val lefts = MemoryStream[EventStreams.Event](spark)
    val rights = MemoryStream[EventStreams.Event](spark)
    // 300s watermark delay: the t+60 right in batch 2 is NOT late
    // (wm after batch 1 = t+120-300), so it must displace the t+120
    // provisional candidate before resolution
    val q = EventStreams
      .asofForwardStream(lefts.toDS(), rights.toDS(),
        toleranceSeconds = 600L, watermarkDelay = "300 seconds")
      .writeStream.format("memory").queryName("asof_fwd_wm").outputMode("append").start()
    try {
      // batch 1: a left at t+0 and a provisional candidate at t+120
      lefts.addData(ev(1L, 0))
      rights.addData(ev(100L, 120))
      q.processAllAvailable()
      assert(spark.table("asof_fwd_wm").count() == 0L,
        "left must stay pending: an earlier right could still arrive inside the watermark")
      // batch 2: a BETTER (earlier) right at t+60 — watermark still
      // below it, so nothing resolves yet
      rights.addData(ev(101L, 60))
      q.processAllAvailable()
      assert(spark.table("asof_fwd_wm").count() == 0L,
        "still pending: watermark has not reached the candidate")
      // batch 3: event time far enough that wm ≥ candidate → resolution
      rights.addData(ev(102L, 1200))
      q.processAllAvailable()
      val got = spark.table("asof_fwd_wm")
        .select($"event_id", $"asof_event_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(1L -> 101L),
        s"the later-arriving earlier right must win before resolution: $got")
    } finally q.stop()
  }

  test("streaming nearest as-of join equals batch asofNearest with tolerance (bounded input)") {
    val tolSec = 3600L
    val base = Tables.events(spark, Sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val maxTs = base.agg(max($"ts")).head().getTimestamp(0)
    val flush = Seq(EventStreams.Event(
      999999998L, new java.sql.Timestamp(maxTs.getTime + 3 * tolSec * 1000), 1L, "view", 0.0)).toDF()
    val fixtureDir = Files.createTempDirectory("graft-asof-near").toString
    base.unionByName(flush).coalesce(1).write.mode("overwrite").parquet(fixtureDir)
    val fixture = spark.read.parquet(fixtureDir)

    val purchases = fixture.where($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value")
    val views = fixture.where($"event_type" === "view")
      .select($"event_id", $"user_id", $"ts", $"value")
    val batch = graft.operators.AsofJoin
      .asofNearest(purchases, views, Seq("user_id"), "ts", "ts", Seq("event_id", "value"),
        toleranceMicros = Some(tolSec * 1000000L))
      .select($"event_id", $"asof_event_id", $"asof_value".cast("string"))
      .collect()
      .map(r => r.getLong(0) -> ((if (r.isNullAt(1)) -1L else r.getLong(1)), r.getString(2)))
      .toMap

    def sideStream(eventType: String) = spark.readStream
      .schema(fixture.schema)
      .parquet(fixtureDir)
      .where($"event_type" === eventType)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventStreams.Event]
    val q = EventStreams
      .asofNearestStream(sideStream("purchase"), sideStream("view"),
        toleranceSeconds = tolSec, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("asof_near_stream").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("asof_near_stream")
        .select($"event_id", $"asof_event_id", $"asof_value".cast("string"))
        .collect()
        .map(r => r.getLong(0) -> ((if (r.isNullAt(1)) -1L else r.getLong(1)), r.getString(2)))
        .toMap
      assert(streamed.size == batch.size, s"${streamed.size} vs ${batch.size}")
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming nearest as-of: pruned rights survive in the latest-register; equidistant goes backward") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:00:00").getTime
    def ev(id: Long, offsetSec: Long) =
      EventStreams.Event(id, new java.sql.Timestamp(t0 + offsetSec * 1000), 1L, "x", id.toDouble)
    val lefts = MemoryStream[EventStreams.Event](spark)
    val rights = MemoryStream[EventStreams.Event](spark)
    val q = EventStreams
      .asofNearestStream(lefts.toDS(), rights.toDS(),
        toleranceSeconds = 600L, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("asof_near_reg").outputMode("append").start()
    try {
      // batch 1: right A at t+0 → wm advances to t+0
      rights.addData(ev(100L, 0))
      q.processAllAvailable()
      // batch 2: left L1 at t+400 — absorbs A from the buffer; the
      // same invocation prunes A (ts ≤ wm) into the latest-register
      lefts.addData(ev(1L, 400))
      q.processAllAvailable()
      // batch 3: left L2 at t+500 (> wm t+400, NOT late) — the right
      // buffer is empty now, so its backward candidate must come from
      // the register
      lefts.addData(ev(2L, 500))
      q.processAllAvailable()
      assert(spark.table("asof_near_reg").count() == 0L,
        "nothing resolves before the watermark passes ts + tolerance")
      // batch 4: far-future right advances the watermark past both
      // lefts' tolerance windows → both resolve backward to A
      rights.addData(ev(102L, 2000))
      q.processAllAvailable()
      val got = spark.table("asof_near_reg")
        .select($"event_id", $"asof_event_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(1L -> 100L, 2L -> 100L),
        s"the pruned right must come back from the register: $got")
    } finally q.stop()
  }

  test("asofForwardStreamTws + asofNearestStreamTws: TWS ports replay the fMGWS watermark scenarios") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:00:00").getTime
    def ev(id: Long, offsetSec: Long) =
      EventStreams.Event(id, new java.sql.Timestamp(t0 + offsetSec * 1000), 1L, "x", id.toDouble)
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // FORWARD: the later-arriving earlier right must displace the
    // provisional candidate before watermark-final resolution — the
    // same scenario the fMGWS spec pins
    val fl = MemoryStream[EventStreams.Event](spark)
    val fr = MemoryStream[EventStreams.Event](spark)
    val qf = EventStreams
      .asofForwardStreamTws(fl.toDS(), fr.toDS(),
        toleranceSeconds = 600L, watermarkDelay = "300 seconds")
      .writeStream.format("memory").queryName("asof_fwd_tws").outputMode("append").start()
    // NEAREST: backward candidates served from the latest-register
    // after the right buffer pruned — the fMGWS register scenario
    val nl = MemoryStream[EventStreams.Event](spark)
    val nr = MemoryStream[EventStreams.Event](spark)
    val qn = EventStreams
      .asofNearestStreamTws(nl.toDS(), nr.toDS(),
        toleranceSeconds = 600L, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("asof_near_tws").outputMode("append").start()
    try {
      fl.addData(ev(1L, 0)); fr.addData(ev(100L, 120))
      qf.processAllAvailable()
      assert(spark.table("asof_fwd_tws").count() == 0L, "pending until wm proves finality")
      fr.addData(ev(101L, 60))
      qf.processAllAvailable()
      assert(spark.table("asof_fwd_tws").count() == 0L)
      fr.addData(ev(102L, 1200))
      qf.processAllAvailable()
      val gotF = spark.table("asof_fwd_tws")
        .select($"event_id", $"asof_event_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotF == Map(1L -> 101L), s"forward TWS: $gotF")
      assert(qf.lastProgress.stateOperators
        .exists(_.operatorName.toLowerCase.contains("transformwithstate")))

      nr.addData(ev(100L, 0))
      qn.processAllAvailable()
      nl.addData(ev(1L, 400))
      qn.processAllAvailable()
      nl.addData(ev(2L, 500))
      qn.processAllAvailable()
      assert(spark.table("asof_near_tws").count() == 0L)
      nr.addData(ev(102L, 2000))
      qn.processAllAvailable()
      val gotN = spark.table("asof_near_tws")
        .select($"event_id", $"asof_event_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotN == Map(1L -> 100L, 2L -> 100L), s"nearest TWS: $gotN")
    } finally {
      qf.stop(); qn.stop()
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("stream-stream interval join equals the batch range join on bounded input") {
    def side(eventType: String, stream: Boolean) = {
      val df =
        if (stream) spark.readStream.schema(spark.read.parquet(eventsDir).schema).parquet(eventsDir)
        else spark.read.parquet(eventsDir)
      df.where($"event_type" === eventType)
        .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
        .as[EventStreams.Event]
    }
    val batch = EventStreams
      .intervalJoinStream(side("purchase", stream = false), side("view", stream = false),
        lookbackSeconds = 1800L)
      .select($"l_event_id", $"r_event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty, "fixture must produce at least one in-window pair")

    val q = EventStreams
      .intervalJoinStream(side("purchase", stream = true), side("view", stream = true),
        lookbackSeconds = 1800L, watermarkDelay = "365 days")
      .select($"l_event_id", $"r_event_id")
      .writeStream.format("memory").queryName("interval_join_stream").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("interval_join_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch, s"stream=${streamed.size} batch=${batch.size}")
    } finally q.stop()
  }

  test("event-time session windows: stream (watermarked) equals batch; counts match row-number sessionization") {
    val batchSessions = EventStreams
      .sessionWindows(Tables.events(spark, Sf0001), watermark = None)
      .select($"user_id", $"session_start", $"n_events")
      .collect()
      .map(_.toSeq)
      .toSet

    val stream = spark.readStream
      .schema(spark.read.parquet(eventsDir).schema)
      .parquet(eventsDir)
    val q = EventStreams
      .sessionWindows(stream, watermark = Some("10 minutes"))
      .writeStream
      .format("memory")
      .queryName("session_windows_stream")
      .outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark
        .table("session_windows_stream")
        .select($"user_id", $"session_start", $"n_events")
        .collect()
        .map(_.toSeq)
        .toSet
      assert(streamed == batchSessions, s"stream=${streamed.size} batch=${batchSessions.size}")
      // total sessions agree with the lag/cumsum formulation
      val lagSessions = EventStreams
        .sessionize(Tables.events(spark, Sf0001))
        .groupBy($"user_id")
        .agg(max($"session_seq").as("n"))
        .agg(sum($"n"))
        .head()
        .getLong(0)
      assert(batchSessions.size.toLong == lagSessions,
        s"window sessions=${batchSessions.size} lag sessions=$lagSessions")
    } finally q.stop()
  }

  test("streaming dedup keeps first doc per content within the watermark; equals batch") {
    // docs-as-stream: (doc_id, ts, text) with exact + whitespace-variant
    // dups arriving later than their originals
    val docsDir = Files.createTempDirectory("graft-docs-stream").toString
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:00:00").getTime
    val rows = Seq(
      (1L, new java.sql.Timestamp(t0), "alpha beta gamma"),
      (2L, new java.sql.Timestamp(t0 + 1000), "delta epsilon zeta"),
      (3L, new java.sql.Timestamp(t0 + 2000), "alpha  beta   gamma"), // ws-variant of 1
      (4L, new java.sql.Timestamp(t0 + 3000), "unique fresh content"),
      (5L, new java.sql.Timestamp(t0 + 4000), "delta epsilon zeta"), // dup of 2
    )
    rows.toDF("doc_id", "ts", "text").coalesce(1).write.mode("overwrite").parquet(docsDir)

    val batchKept = EventStreams
      .dedupStream(spark.read.parquet(docsDir), "ts", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(batchKept == Set(1L, 2L, 4L), s"batch: $batchKept")

    val stream = spark.readStream
      .schema(spark.read.parquet(docsDir).schema)
      .parquet(docsDir)
    val q = EventStreams
      .dedupStream(stream, "ts", "text", watermarkDelay = "1 hour")
      .writeStream
      .format("memory")
      .queryName("dedup_stream")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val streamKept = spark.table("dedup_stream").select("doc_id").as[Long].collect().toSet
      assert(streamKept == batchKept, s"stream=$streamKept batch=$batchKept")
    } finally q.stop()
  }

  test("streaming near-dup: banded minhash state finds planted pair, stream equals batch") {
    val base = "the quick brown fox jumps over the lazy dog while seventy owls " +
      "watch from nearby trees and comment on the unfolding chase below them"
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 09:00:00").getTime
    val rows = Seq(
      (1L, new java.sql.Timestamp(t0), base),
      (2L, new java.sql.Timestamp(t0 + 5000), base + " tonight"), // near-dup of 1
      (3L, new java.sql.Timestamp(t0 + 9000), "completely different content about " +
        "distributed query engines shuffles partitions and adaptive execution plans"),
    )
    val batchDf = rows.toDF("doc_id", "ts", "text")
    val batchPairs = graft.streaming.StreamingDedup
      .nearDupHits(batchDf, "doc_id", "ts", "text", estThreshold = 0.5)
      .select($"id_a", $"id_b").distinct().as[(Long, Long)].collect().toSet
    assert(batchPairs == Set((1L, 2L)), s"batch: $batchPairs")

    val dir = Files.createTempDirectory("graft-neardup-stream").toString
    batchDf.coalesce(1).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batchDf.schema).parquet(dir)
    val q = graft.streaming.StreamingDedup
      .nearDupHits(stream, "doc_id", "ts", "text", estThreshold = 0.5)
      .writeStream.format("memory").queryName("neardup_stream").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamPairs = spark.table("neardup_stream")
        .select($"id_a", $"id_b").distinct().as[(Long, Long)].collect().toSet
      assert(streamPairs == batchPairs, s"stream=$streamPairs batch=$batchPairs")
    } finally q.stop()
  }

  test("streaming ml_pred scoring produces per-row predictions") {
    MlFunctions.create(
      spark,
      "stream_model",
      """{"layers":[{"in":1,"out":4,"activation":"relu"},{"in":4,"out":1}]}""",
    )
    val stream = spark.readStream
      .schema(spark.read.parquet(eventsDir).schema)
      .parquet(eventsDir)
    val scored = EventStreams.scoreStream(
      spark,
      stream,
      "stream_model",
      array($"value".cast("float")),
    )
    val q = scored
      .select($"event_id", $"prediction")
      .writeStream
      .format("memory")
      .queryName("scored_stream")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val n = spark.table("scored_stream").where(size($"prediction") === 1).count()
      assert(n == spark.read.parquet(eventsDir).count())
    } finally q.stop()
  }

  test("stateless curation operators stream as-is: quality + repetition + LM ≡ batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog repeatedly and carefully",
      "buy now buy now buy now buy now",
      "short",
    )
    val batchDf = texts.toDF("text")
    val lm = graft.operators.LmQuality.train(batchDf, "text", vocabSize = 100)
    def curate(df: org.apache.spark.sql.DataFrame) = {
      val q = graft.operators.TextAnalysis.qualityScore(df, "text")
      val r = graft.operators.TextAnalysis.withNgramRepetition(q, "text")
      val s = graft.operators.TextAnalysis.withTextSignals(
        graft.operators.LmQuality.score(r, "text", lm), "text")
      s.select($"text", $"quality_score", $"dup_bigram_frac", $"avg_logprob",
        $"unigram_entropy", $"compression_ratio", $"max_line_len")
    }
    val mem = MemoryStream[String](spark)
    val q = curate(mem.toDF().withColumnRenamed("value", "text"))
      .writeStream.format("memory").queryName("curate_stream").outputMode("append").start()
    try {
      mem.addData(texts: _*)
      q.processAllAvailable()
      def rowKey(r: org.apache.spark.sql.Row) =
        r.getString(0) -> (1 until r.length).map(i =>
          if (r.isNullAt(i)) None else Some(r.get(i)))
      val stream = spark.table("curate_stream").collect().map(rowKey).toMap
      val batch = curate(batchDf).collect().map(rowKey).toMap
      assert(stream == batch, "streaming curation must equal the batch pass bit-for-bit")
    } finally q.stop()
  }

  test("DSIR scoring is stateless: streamed log weights equal the batch pass bit-for-bit") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val target = Seq("astro nova quasar", "astro quasar pulsar").toDF("text")
    val raw = (Seq("astro nova quasar", "granite basalt slate", "granite slate marble",
      "astro granite mixed bag", "the plain filler line")).toDF("text")
    val model = graft.operators.Dsir.fit(target, raw, "text")
    def score(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Dsir.importanceWeights(df, "text", model).select($"text", $"log_weight")
    val texts = Seq("astro nova quasar", "granite basalt slate", "astro granite mixed bag")
    val mem = MemoryStream[String](spark)
    val q = score(mem.toDF().withColumnRenamed("value", "text"))
      .writeStream.format("memory").queryName("dsir_stream").outputMode("append").start()
    try {
      mem.addData(texts.take(1): _*)
      q.processAllAvailable()
      mem.addData(texts.drop(1): _*)
      q.processAllAvailable()
      val stream = spark.table("dsir_stream").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      val batch = score(texts.toDF("text")).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(stream == batch, "broadcast-model scoring must stream bit-identically")
    } finally q.stop()
  }

  test("streaming heavy hitters: merged state equals batch sketch in the exact regime") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingSketches
    // skewed key stream across two micro-batches
    val b1 = Seq.fill(60)("hot") ++ Seq.fill(10)("warm") ++ (1 to 20).map(i => s"rare$i")
    val b2 = Seq.fill(40)("hot") ++ Seq.fill(25)("cool") ++ (21 to 30).map(i => s"rare$i")
    val mem = MemoryStream[String](spark)
    val capacity = 64 // ≥ distinct keys per group → exact regime
    val q = StreamingSketches
      .heavyHittersStream(mem.toDF().withColumnRenamed("value", "k"), "k", capacity,
        numGroups = 4)
      .writeStream
      .format("memory")
      .queryName("hh_stream")
      .outputMode("update")
      .start()
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      val updates = spark
        .table("hh_stream")
        .as[StreamingSketches.HeavyHittersUpdate]
        .collect()
        .toSeq
      // state totals are exact counters across both batches
      assert(updates.groupBy(_.group_id).values.map(_.last.total_seen).sum ==
        (b1.length + b2.length))
      val merged = StreamingSketches.mergeUpdates(updates, capacity, topN = 3)
      assert(merged == Seq(("hot", 100L), ("cool", 25L), ("warm", 10L)), s"got $merged")
      // cross-check against the batch operator over the union of batches
      val batch = graft.operators.Sketches
        .heavyHitters((b1 ++ b2).map(Tuple1(_)).toDF("k"), "k", capacity, topN = 3)
        .as[(String, Long)]
        .collect()
        .toSeq
      assert(merged == batch, s"stream=$merged batch=$batch")
    } finally q.stop()
  }

  test("streaming count-min: summed group grids equal the batch sketch bit-for-bit") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingSketches
    val b1 = Seq.fill(30)("hot") ++ Seq.fill(5)("warm") ++ (1 to 15).map(i => s"rare$i")
    val b2 = Seq.fill(20)("hot") ++ Seq.fill(9)("cool") ++ (16 to 25).map(i => s"rare$i")
    val (depth, width) = (4, 1 << 10)
    val mem = MemoryStream[String](spark)
    val q = StreamingSketches
      .cmsStream(mem.toDF().withColumnRenamed("value", "k"), "k", depth, width, numGroups = 4)
      .writeStream
      .format("memory")
      .queryName("cms_stream")
      .outputMode("update")
      .start()
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      val updates = spark
        .table("cms_stream")
        .as[StreamingSketches.CmsUpdate]
        .collect()
        .toSeq
      assert(updates.groupBy(_.group_id).values.map(_.last.total_seen).sum ==
        (b1.length + b2.length))
      val merged = StreamingSketches.mergeCmsUpdates(updates, depth, width)
      val batch = graft.operators.Sketches
        .countMinSketch((b1 ++ b2).map(Tuple1(_)).toDF("k"), "k", depth, width)
      assert(merged.table.toSeq == batch.table.toSeq,
        "summed stream grids must equal the batch grid bit-for-bit")
      assert(merged.estimate("hot") == 50L && merged.estimate("cool") == 9L &&
        merged.estimate("rare7") == 1L && merged.estimate("never") == 0L)
    } finally q.stop()
  }

  test("streaming dsir selection: merged slice top-ks equal batch select exactly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingDsir
    val target = Seq("astro nova quasar", "astro quasar pulsar").toDF("text")
    // string ids: tied scores (symmetric planted texts) break on the
    // id in BOTH faces — see the tie-break caveat in StreamingDsir
    val docs = (1 to 40).map { i =>
      val t = if (i % 4 == 0) s"astro nova quasar doc$i" else s"granite basalt slate doc$i"
      (f"d$i%02d", t)
    }
    val raw = docs.toDF("id", "text")
    val model = graft.operators.Dsir.fit(target, raw, "text")
    val batch = graft.operators.Dsir.select(raw, "id", "text", 10, model)
      .select($"id".cast("string"), $"score").as[(String, Double)].collect().toSeq
    val mem = MemoryStream[(String, String)](spark)
    val q = StreamingDsir
      .dsirSelectStream(mem.toDF().toDF("id", "text"), "id", "text", 10, model, numGroups = 4)
      .writeStream
      .format("memory")
      .queryName("dsir_select_stream")
      .outputMode("update")
      .start()
    try {
      mem.addData(docs.take(15): _*)
      q.processAllAvailable()
      mem.addData(docs.drop(15): _*)
      q.processAllAvailable()
      val updates = spark
        .table("dsir_select_stream")
        .as[StreamingDsir.SelectionUpdate]
        .collect()
        .toSeq
      assert(updates.groupBy(_.group_id).values.map(_.last.total_seen).sum == docs.length)
      val merged = StreamingDsir.mergeSelectionUpdates(updates, 10)
      assert(merged == batch,
        s"stream top-k must equal batch select exactly:\n$merged\nvs\n$batch")
    } finally q.stop()
  }

  test("streaming kll: merged group builders equal the batch quantiles in the exact regime") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingSketches
    val rng = new scala.util.Random(17)
    val b1 = Seq.fill(400)(rng.nextDouble() * 100)
    val b2 = Seq.fill(350)(rng.nextDouble() * 100)
    val k = 1024 // ≥ any slice: exact regime
    val mem = MemoryStream[Double](spark)
    val q = StreamingSketches
      .kllStream(mem.toDF().withColumnRenamed("value", "v"), "v", k, numGroups = 4)
      .writeStream
      .format("memory")
      .queryName("kll_stream")
      .outputMode("update")
      .start()
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      val updates = spark
        .table("kll_stream")
        .as[StreamingSketches.KllUpdate]
        .collect()
        .toSeq
      assert(updates.groupBy(_.group_id).values.map(_.last.n).sum == (b1.length + b2.length))
      val merged = StreamingSketches.mergeKllUpdates(updates, k)
      val all = (b1 ++ b2).sorted
      for (qq <- Seq(0.25, 0.5, 0.75, 1.0)) {
        val want = all(math.ceil(qq * all.length).toInt - 1)
        assert(merged.quantile(qq) == want, s"q=$qq")
      }
    } finally q.stop()
  }

  test("streaming hll: max-merged group registers equal the batch sketch bit-for-bit") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingSketches
    val b1 = (1 to 300).map(i => s"u$i") ++ Seq.fill(40)("hot")
    val b2 = (200 to 500).map(i => s"u$i") // overlaps b1 on u200..u300
    val p = 11
    val mem = MemoryStream[String](spark)
    val q = StreamingSketches
      .hllStream(mem.toDF().withColumnRenamed("value", "k"), "k", p, numGroups = 4)
      .writeStream
      .format("memory")
      .queryName("hll_stream")
      .outputMode("update")
      .start()
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      val updates = spark
        .table("hll_stream")
        .as[StreamingSketches.HllUpdate]
        .collect()
        .toSeq
      assert(updates.groupBy(_.group_id).values.map(_.last.total_seen).sum ==
        (b1.length + b2.length))
      val merged = StreamingSketches.mergeHllUpdates(updates, p)
      val batch = graft.operators.Sketches
        .hyperLogLog((b1 ++ b2).map(Tuple1(_)).toDF("k"), "k", p)
      assert(merged.registers.toSeq == batch.registers.toSeq,
        "max-merged stream registers must equal the batch registers bit-for-bit")
      // 501 true distinct (u1..u500 + hot); 3σ band at p=11
      val est = merged.distinctEstimate
      assert(math.abs(est - 501) <= math.max(3.0 * 1.04 / math.sqrt(1 << p) * 501, 3.0),
        s"est=$est")
    } finally q.stop()
  }

  test("webIngestStream: stream ≡ batch on event-ordered input — extract, filter, dedup, host cap") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingWebIngest
    import graft.streaming.StreamingWebIngest.WebDoc
    val prose = "the data and model pipeline have that sort of careful work " +
      "to be done with many diverse sources and long running jobs "
    def distinctProse(i: Int) = (prose * 3).trim.split(" ").zipWithIndex
      .map { case (w, j) => if (j % 4 == 3) s"$w$i" else w }.mkString(" ")
    def page(body: String) =
      s"<html><head><script>if (1 < 2) alert('x');</script></head><body><p>$body</p></body></html>"
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:00:00").getTime
    def doc(id: Long, sec: Long, body: String, url: String) =
      WebDoc(id, new java.sql.Timestamp(t0 + sec * 1000), page(body), url)
    // host a: 4 good docs (cap 2 bites); host b: an exact-dup pair, a
    // garbage doc, and a Chinese doc kept by the whitelist
    val batch1 = Seq(
      doc(1L, 1, distinctProse(1), "HTTP://A.com:80/p1#f"),
      doc(2L, 2, distinctProse(2), "http://a.com/p2"),
      doc(10L, 3, distinctProse(10), "http://b.com/x"))
    val batch2 = Seq(
      doc(3L, 4, distinctProse(3), "http://a.com/p3"),
      doc(4L, 5, distinctProse(4), "http://a.com/p4"),
      doc(11L, 6, distinctProse(10), "http://b.com/y"), // exact dup of 10
      doc(12L, 7, Seq.fill(60)("### 12345 …").mkString(" "), "http://b.com/junk"),
      doc(13L, 8, "今天天气很好我们一起去公园散步然后吃晚饭", "http://b.com/zh"),
      doc(20L, 9, distinctProse(20), "http://ads.Spam.net/x")) // blocklisted domain
    val blocklist = Seq("spam.net").toDF("domain")
    val in = MemoryStream[WebDoc](spark)
    val q = StreamingWebIngest
      .webIngestStream(in.toDS().toDF(), "doc_id", "ts", "html", "url",
        langs = Seq("en", "zh"), maxPerHost = 2, blocklist = Some(blocklist))
      .writeStream.format("memory").queryName("web_ingest_stream")
      .outputMode("append").start()
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2: _*)
      q.processAllAvailable()
      val stream = spark.table("web_ingest_stream")
        .select($"id", $"url_host", $"lang_pred", $"text")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
        .toSet
      val batch = StreamingWebIngest
        .webIngestStream((batch1 ++ batch2).toDF(), "doc_id", "ts", "html", "url",
          langs = Seq("en", "zh"), maxPerHost = 2, blocklist = Some(blocklist))
        .select($"id", $"url_host", $"lang_pred", $"text")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
        .toSet
      assert(stream == batch, s"stream=$stream batch=$batch")
      val ids = stream.map(_._1)
      assert(ids.count(_ <= 4L) == 2, s"host a capped to 2: $ids")
      assert(!ids.contains(12L), "garbage dropped at the language gate")
      assert(ids.contains(13L), "whitelisted out-of-scope language passes through")
      assert(!(ids.contains(10L) && ids.contains(11L)), "exact dup collapses")
      assert(!ids.contains(20L), "blocklisted domain (subdomain, mixed case) dropped in both modes")
      assert(stream.forall(!_._4.contains("<")), "markup stripped")
    } finally q.stop()
  }

  test("webIngestStreamTws: ported face stream ≡ batch ≡ fMGWS face, both stages chained TWS in one query") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingWebIngest
    import graft.streaming.StreamingWebIngest.WebDoc
    val prose = "the data and model pipeline have that sort of careful work " +
      "to be done with many diverse sources and long running jobs "
    def distinctProse(i: Int) = (prose * 3).trim.split(" ").zipWithIndex
      .map { case (w, j) => if (j % 4 == 3) s"$w$i" else w }.mkString(" ")
    def page(body: String) = s"<html><body><p>$body</p></body></html>"
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:00:00").getTime
    def doc(id: Long, sec: Long, body: String, url: String) =
      WebDoc(id, new java.sql.Timestamp(t0 + sec * 1000), page(body), url)
    val batch1 = Seq(
      doc(1L, 1, distinctProse(1), "http://a.com/p1"),
      doc(2L, 2, distinctProse(2), "http://a.com/p2"),
      doc(10L, 3, distinctProse(10), "http://b.com/x"))
    val batch2 = Seq(
      doc(3L, 4, distinctProse(3), "http://a.com/p3"), // 3rd on host a → cap 2 bites
      doc(11L, 5, distinctProse(10), "http://b.com/y"), // exact dup of 10 ACROSS triggers
      doc(12L, 6, Seq.fill(60)("### 12345 …").mkString(" "), "http://b.com/junk"),
      doc(13L, 7, distinctProse(13), "http://b.com/z"))
    val curate = (df: org.apache.spark.sql.DataFrame) => StreamingWebIngest
      .webIngestStreamTws(df, "doc_id", "ts", "html", "url",
        langs = Seq("en"), maxPerHost = 2)
    val batchKept = curate((batch1 ++ batch2).toDF())
      .select($"id").as[Long].collect().toSet
    assert(batchKept == Set(1L, 2L, 10L, 13L), s"batch: $batchKept")
    // the ported face must agree with the fMGWS original on batch input
    val fmgwsKept = StreamingWebIngest
      .webIngestStream((batch1 ++ batch2).toDF(), "doc_id", "ts", "html", "url",
        langs = Seq("en"), maxPerHost = 2)
      .select($"id").as[Long].collect().toSet
    assert(batchKept == fmgwsKept, s"tws=$batchKept fmgws=$fmgwsKept")

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[WebDoc](spark)
    val q = curate(in.toDS().toDF())
      .writeStream.format("memory").queryName("web_ingest_tws")
      .outputMode("append").start()
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2: _*) // dedup + budget state must persist across triggers
      q.processAllAvailable()
      val streamKept = spark.table("web_ingest_tws").select($"id").as[Long].collect().toSet
      assert(streamKept == batchKept, s"stream=$streamKept batch=$batchKept")
      // the end-to-end chain is the point of the port: BOTH stateful
      // stages are transformWithState operators in THIS one query
      val ops = q.lastProgress.stateOperators.map(_.operatorName).toSeq
      assert(ops.length == 2 && ops.forall(_.toLowerCase.contains("transformwithstate")),
        s"expected two chained TWS operators, got $ops")
    } finally {
      q.stop()
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("webIngestWithNearDup: victim side stream ≡ batch; victim is the later arrival") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingWebIngest
    import graft.streaming.StreamingWebIngest.WebDoc
    val prose = "the data and model pipeline have that sort of careful work " +
      "to be done with many diverse sources and long running jobs "
    def distinctProse(i: Int) = (prose * 3).trim.split(" ").zipWithIndex
      .map { case (w, j) => if (j % 4 == 3) s"$w$i" else w }.mkString(" ")
    def page(body: String) =
      s"<html><body><p>$body</p></body></html>"
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:00:00").getTime
    def doc(id: Long, sec: Long, body: String, url: String) =
      WebDoc(id, new java.sql.Timestamp(t0 + sec * 1000), page(body), url)
    val rows = Seq(
      doc(30L, 1, distinctProse(30), "http://c.com/p0"),
      doc(40L, 2, distinctProse(40), "http://c.com/p1"),         // unrelated survivor
      doc(31L, 3, distinctProse(30) + " extra tail tonight", "http://c.com/p2"), // near-dup of 30
    )
    val in = MemoryStream[WebDoc](spark)
    val (mainS, victimS) = StreamingWebIngest.webIngestWithNearDup(
      in.toDS().toDF(), "doc_id", "ts", "html", "url",
      langs = Seq("en"), estThreshold = 0.5)
    val qm = mainS.writeStream.format("memory").queryName("wind_main")
      .outputMode("append").start()
    val qv = victimS.writeStream.format("memory").queryName("wind_victims")
      .outputMode("append").start()
    try {
      in.addData(rows: _*)
      qm.processAllAvailable()
      qv.processAllAvailable()
      val streamVictims = spark.table("wind_victims")
        .select($"victim_id", $"kept_id").distinct().as[(Long, Long)].collect().toSet
      assert(streamVictims == Set((31L, 30L)), s"stream victims: $streamVictims")
      // suppression is sink-side by design: the main stream still carries 31
      val mainIds = spark.table("wind_main").select($"id").as[Long].collect().toSet
      assert(mainIds == Set(30L, 40L, 31L), s"main: $mainIds")
      // batch evaluation of the same faces agrees
      val (mainB, victimB) = StreamingWebIngest.webIngestWithNearDup(
        rows.toDF(), "doc_id", "ts", "html", "url",
        langs = Seq("en"), estThreshold = 0.5)
      val batchVictims =
        victimB.select($"victim_id", $"kept_id").distinct().as[(Long, Long)].collect().toSet
      assert(batchVictims == streamVictims, s"batch=$batchVictims stream=$streamVictims")
      // the compacted corpus = main anti-join victims (keep-first)
      val compacted = mainB.join(
        victimB.select($"victim_id".as("id")), Seq("id"), "left_anti")
        .select($"id").as[Long].collect().toSet
      assert(compacted == Set(30L, 40L), s"compacted: $compacted")
    } finally { qm.stop(); qv.stop() }
  }

  test("webIngestStream c4 option: stream ≡ batch, unpunctuated page drops, js line stripped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingWebIngest
    import graft.streaming.StreamingWebIngest.WebDoc
    val prose = "the data and model pipeline have that sort of careful work " +
      "to be done with many diverse sources and long running jobs "
    def distinctProse(i: Int) = (prose * 3).trim.split(" ").zipWithIndex
      .map { case (w, j) => if (j % 4 == 3) s"$w$i" else w }.mkString(" ")
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:00:00").getTime
    val html60 = "<html><body>" +
      s"<p>${distinctProse(1)}.</p>" +
      "<p>please enable javascript to continue reading here.</p>" +
      s"<p>${distinctProse(5)}!</p><p>${distinctProse(9)}?</p></body></html>"
    val html61 = s"<html><body><p>${distinctProse(7)}</p></body></html>"
    val rows = Seq(
      WebDoc(60L, new java.sql.Timestamp(t0 + 1000), html60, "http://good.com/a"),
      WebDoc(61L, new java.sql.Timestamp(t0 + 2000), html61, "http://good.com/b"))
    val in = MemoryStream[WebDoc](spark)
    val q = StreamingWebIngest
      .webIngestStream(in.toDS().toDF(), "doc_id", "ts", "html", "url", c4 = true)
      .writeStream.format("memory").queryName("wis_c4").outputMode("append").start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      val stream = spark.table("wis_c4").select($"id", $"text")
        .as[(Long, String)].collect().toMap
      assert(stream.keySet == Set(60L), s"stream: ${stream.keySet}")
      assert(!stream(60L).contains("javascript"))
      val batch = StreamingWebIngest
        .webIngestStream(rows.toDF(), "doc_id", "ts", "html", "url", c4 = true)
        .select($"id", $"text").as[(Long, String)].collect().toMap
      assert(batch == stream, "batch evaluation of the c4 face must agree")
    } finally q.stop()
  }

  test("webIngestStream paragraph options: stream ≡ batch, in-doc repeated block collapses, structure kept") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingWebIngest
    import graft.streaming.StreamingWebIngest.WebDoc
    val prose = "the data and model pipeline have that sort of careful work " +
      "to be done with many diverse sources and long running jobs"
    val banner = "subscribe to the weekly newsletter for updates and news today"
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:00:00").getTime
    // concatenated-capture shape: the banner LINE repeats (in-doc line
    // dedup eats the second), and a block of SHORT lines repeats —
    // each line is under the line-dedup exemption floor, so ONLY the
    // paragraph stage can drop the repeated block as a unit
    val html = s"<html><body><div>$banner</div><div>ab<br>cd</div><p>$prose</p>" +
      s"<div>$banner</div><div>ab<br>cd</div>" +
      s"<p>$prose extra tail words here</p></body></html>"
    val rows = Seq(WebDoc(70L, new java.sql.Timestamp(t0 + 1000), html, "http://good.com/p"))
    val in = MemoryStream[WebDoc](spark)
    val q = StreamingWebIngest
      .webIngestStream(in.toDS().toDF(), "doc_id", "ts", "html", "url",
        paragraphBreaks = true, paragraphDedup = true)
      .writeStream.format("memory").queryName("wis_para").outputMode("append").start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      val stream = spark.table("wis_para").select($"id", $"text")
        .as[(Long, String)].collect().toMap
      assert(stream.keySet == Set(70L))
      val txt = stream(70L)
      assert(txt.split("\n{2,}").count(_ == banner) == 1,
        s"repeated banner must collapse to one occurrence: $txt")
      assert(txt.split("\n{2,}").count(_ == "ab\ncd") == 1,
        s"the short-lines block must drop as a PARAGRAPH unit: $txt")
      assert(txt.contains("\n\n"), "paragraph structure must survive the stream path")
      assert(txt.split("\n{2,}").length == 4, s"expected 4 surviving blocks: $txt")
      val batch = StreamingWebIngest
        .webIngestStream(rows.toDF(), "doc_id", "ts", "html", "url",
          paragraphBreaks = true, paragraphDedup = true)
        .select($"id", $"text").as[(Long, String)].collect().toMap
      assert(batch == stream, "batch evaluation of the paragraph face must agree")
      // default flags stay byte-stable: no blank lines in the output
      val q2in = MemoryStream[WebDoc](spark)
      val q2 = StreamingWebIngest
        .webIngestStream(q2in.toDS().toDF(), "doc_id", "ts", "html", "url")
        .writeStream.format("memory").queryName("wis_para_def").outputMode("append").start()
      try {
        q2in.addData(rows: _*)
        q2.processAllAvailable()
        val def0 = spark.table("wis_para_def").select($"text").as[String].head()
        assert(!def0.contains("\n\n"), "default path must stay byte-stable (no blank lines)")
      } finally q2.stop()
    } finally q.stop()
  }

  test("webIngestStream paragraph face at the q156 plant shape: stream ≡ batch; in-doc vs corpus-wide granularity pinned") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingWebIngest
    import graft.streaming.StreamingWebIngest.WebDoc
    // the q156 plant, per page: boilerplate block B (two lines,
    // IDENTICAL on every page), partial-overlap block P sharing B's
    // first line with a doc-unique tail, and a doc-unique content
    // block. Cross-doc semantics differ BY DESIGN between the faces:
    // the batch corpus-wide stage keeps B only on the minimum doc,
    // the streaming face dedups IN-DOC (B survives per page) — this
    // spec pins both sides so neither can drift silently.
    val boiler1 = "all rights reserved - generated boilerplate paragraph"
    val boiler2 = "all rights reserved and more details follow here"
    def content(id: Long) = (0 until 20)
      .map(k => s"the item${id}x$k words")
      .mkString(" ")
    def html(id: Long) =
      s"<html><body><div>$boiler1<br>$boiler2</div>" +
        s"<div>$boiler1<br>overlap item${id}y0 continues here</div>" +
        s"<p>${content(id)}</p></body></html>"
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:00:00").getTime
    val rows = Seq(1L, 2L, 3L).map(i =>
      WebDoc(i, new java.sql.Timestamp(t0 + i * 1000), html(i), s"http://good.com/p$i"))
    val in = MemoryStream[WebDoc](spark)
    val q = StreamingWebIngest
      .webIngestStream(in.toDS().toDF(), "doc_id", "ts", "html", "url",
        paragraphBreaks = true, paragraphDedup = true, minLineChars = -1)
      .writeStream.format("memory").queryName("wis_q156").outputMode("append").start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      val stream = spark.table("wis_q156").select($"id", $"text")
        .as[(Long, String)].collect().toMap
      assert(stream.keySet == Set(1L, 2L, 3L), s"all pages survive: ${stream.keySet}")
      // bounded-frame evaluation of the SAME face must agree row-for-row
      val batch = StreamingWebIngest
        .webIngestStream(rows.toDF(), "doc_id", "ts", "html", "url",
          paragraphBreaks = true, paragraphDedup = true, minLineChars = -1)
        .select($"id", $"text").as[(Long, String)].collect().toMap
      assert(batch == stream, "stream ≡ batch on the q156 plant shape")
      // in-doc granularity: B survives on EVERY page (it appears once
      // per page — nothing in-doc to fold), and P survives INTACT,
      // shared first line included (the coarser-unit guarantee)
      rows.foreach { d =>
        val txt = stream(d.doc_id)
        val paras = txt.split("\n{2,}").toSeq
        assert(paras.count(_ == s"$boiler1\n$boiler2") == 1,
          s"in-doc face keeps the cross-doc boilerplate once per page: $txt")
        assert(paras.exists(p => p.startsWith(boiler1 + "\n") &&
          p.contains(s"overlap item${d.doc_id}y0")),
          s"partial-overlap block must survive intact: $txt")
      }
      // corpus-wide granularity over the SAME landed texts: B folds to
      // its first occurrence (min doc), P still survives intact — the
      // q156/q154 batch semantics, pinned against the stream output
      val landed = stream.toSeq.toDF("doc_id", "text")
      val corpusWide = graft.operators.Dedup
        .paragraphDedup(landed, "doc_id", "text")
        .select($"id", $"clean_text").as[(Long, String)].collect().toMap
      val keepsB = corpusWide.filter(_._2.contains(s"$boiler1\n$boiler2")).keySet
      assert(keepsB == Set(1L),
        s"corpus-wide face keeps the boilerplate block only on the min doc: $keepsB")
      assert(Seq(1L, 2L, 3L).forall(i =>
        corpusWide(i).contains(s"overlap item${i}y0")),
        s"partial-overlap tails survive corpus-wide too: $corpusWide")
    } finally q.stop()
  }

  test("webIngestStream pii/soft404 options: stream ≡ batch, contact variants collapse, parking page drops") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingWebIngest
    import graft.streaming.StreamingWebIngest.WebDoc
    val prose = "the data and model pipeline have that sort of careful work " +
      "to be done with many diverse sources and long running jobs "
    def distinctProse(i: Int) = (prose * 3).trim.split(" ").zipWithIndex
      .map { case (w, j) => if (j % 4 == 3) s"$w$i" else w }.mkString(" ")
    def page(body: String) = s"<html><body><p>$body</p></body></html>"
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:00:00").getTime
    def doc(id: Long, sec: Long, body: String, url: String) =
      WebDoc(id, new java.sql.Timestamp(t0 + sec * 1000), page(body), url)
    val rows = Seq(
      // 70/71: identical prose, DIFFERENT contact details — must
      // collapse to the first arrival once redaction runs before the
      // fingerprint dedup state
      doc(70L, 1, distinctProse(1) + " contact alice@example.org or 10.0.0.7 soon",
        "http://a.com/p1"),
      doc(71L, 2, distinctProse(1) + " contact bob@other.net or 10.0.0.9 soon",
        "http://a.com/p2"),
      // 72: fluent page that is really a parking notice
      doc(72L, 3, distinctProse(2) + " this domain is for sale right now",
        "http://a.com/p3"),
      // 73: plain survivor
      doc(73L, 4, distinctProse(3), "http://a.com/p4"))
    val in = MemoryStream[WebDoc](spark)
    val q = StreamingWebIngest
      .webIngestStream(in.toDS().toDF(), "doc_id", "ts", "html", "url",
        langs = Seq("en"), soft404 = true, redactPii = true)
      .writeStream.format("memory").queryName("wis_pii").outputMode("append").start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      val stream = spark.table("wis_pii").select($"id", $"text")
        .as[(Long, String)].collect().toMap
      assert(stream.keySet == Set(70L, 73L), s"stream: ${stream.keySet}")
      assert(stream(70L).endsWith("contact [EMAIL] or [IP] soon"),
        s"redacted text shipped: ${stream(70L)}")
      assert(!stream(70L).contains("alice@"), "raw email must not survive")
      val batch = StreamingWebIngest
        .webIngestStream(rows.toDF(), "doc_id", "ts", "html", "url",
          langs = Seq("en"), soft404 = true, redactPii = true)
        .select($"id", $"text").as[(Long, String)].collect().toMap
      assert(batch == stream, "batch evaluation of the pii/soft404 face must agree")
    } finally q.stop()
  }

  test("corpusNearDupHits: stream-static join flags corpus near-dups, stream ≡ batch, fresh docs clean") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingDedup
    val base = "the data and model pipeline have that sort of careful work " +
      "to be done with many diverse sources and long running jobs"
    def marked(i: Int) = base.split(" ").zipWithIndex
      .map { case (w, j) => if (j % 4 == 3) s"$w$i" else w }.mkString(" ")
    val corpus = Seq((1L, marked(1)), (2L, marked(2))).toDF("doc_id", "text")
    val sigs = graft.operators.Dedup.minHashSignatures(corpus, "doc_id", "text")
      .localCheckpoint(true) // static side of the stream-static join
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:00:00").getTime
    val rows = Seq(
      (10L, new java.sql.Timestamp(t0 + 1000), marked(1) + " tail"), // hits corpus doc 1
      (11L, new java.sql.Timestamp(t0 + 2000),
        (0 until 30).map(k => s"u11x$k").mkString(" ")), // fresh
    )
    val in = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    val q = StreamingDedup
      .corpusNearDupHits(in.toDS().toDF("doc_id", "ts", "text"), "doc_id", "ts", "text",
        sigs, threshold = 0.5)
      .toDF()
      .writeStream.format("memory").queryName("corpus_hits").outputMode("append").start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      val stream = spark.table("corpus_hits")
        .select($"id", $"corpus_id").distinct().as[(Long, Long)].collect().toSet
      assert(stream == Set((10L, 1L)), s"stream hits: $stream")
      val batch = StreamingDedup
        .corpusNearDupHits(rows.toDF("doc_id", "ts", "text"), "doc_id", "ts", "text",
          sigs, threshold = 0.5)
        .toDF()
        .select($"id", $"corpus_id").distinct().as[(Long, Long)].collect().toSet
      assert(batch == stream, s"batch=$batch stream=$stream")
      // the flagged jaccard is exact (verified against corpus grams)
      val j = spark.table("corpus_hits").select($"jaccard").as[Double].collect().head
      assert(j > 0.5 && j <= 1.0, s"jaccard=$j")
    } finally q.stop()
  }

  test("corpusNearDupHits via SignatureStore: live stream joins the bucketed table, hits ≡ frame path") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingDedup
    val base = "the data and model pipeline have that sort of careful work " +
      "to be done with many diverse sources and long running jobs"
    def marked(i: Int) = base.split(" ").zipWithIndex
      .map { case (w, j) => if (j % 4 == 3) s"$w$i" else w }.mkString(" ")
    val corpus = Seq((1L, marked(1)), (2L, marked(2))).toDF("doc_id", "text")
    val sigs = graft.operators.Dedup.minHashSignatures(corpus, "doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-sigstore-stream").toString
    graft.operators.Dedup.writeSignatures(sigs, dir, "sigstore_stream")
    val store = graft.operators.Dedup.readSignatures(spark, dir, "sigstore_stream")
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:00:00").getTime
    val rows = Seq(
      (10L, new java.sql.Timestamp(t0 + 1000), marked(1) + " tail"), // hits corpus doc 1
      (11L, new java.sql.Timestamp(t0 + 2000),
        (0 until 30).map(k => s"u11x$k").mkString(" ")), // fresh
    )
    val in = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    val q = StreamingDedup
      .corpusNearDupHits(in.toDS().toDF("doc_id", "ts", "text"), "doc_id", "ts", "text",
        store, threshold = 0.5)
      .toDF()
      .writeStream.format("memory").queryName("store_hits").outputMode("append").start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      val stream = spark.table("store_hits")
        .select($"id", $"corpus_id").distinct().as[(Long, Long)].collect().toSet
      assert(stream == Set((10L, 1L)), s"stream hits: $stream")
      val frame = StreamingDedup
        .corpusNearDupHits(rows.toDF("doc_id", "ts", "text"), "doc_id", "ts", "text",
          sigs, threshold = 0.5)
        .toDF().select($"id", $"corpus_id").distinct().as[(Long, Long)].collect().toSet
      assert(frame == stream, s"frame=$frame stream=$stream")
    } finally q.stop()
  }

  test("compactSignatureStore: one daily turn folds increments, prunes increments + old epochs; empty turn is a no-op") {
    import graft.operators.Dedup
    import graft.streaming.StreamingDedup
    val base = "the data and model pipeline have that sort of careful work " +
      "to be done with many diverse sources and long running jobs"
    def marked(i: Int) = base.split(" ").zipWithIndex
      .map { case (w, j) => if (j % 4 == 3) s"$w$i" else w }.mkString(" ")
    def fresh(id: Long) = (id, (0 until 30).map(k => s"u${id}x$k").mkString(" "))
    val root = java.nio.file.Files.createTempDirectory("graft-csl-root").toString
    val incDir = java.nio.file.Files.createTempDirectory("graft-csl-inc").toString
    Dedup.writeSignatures(
      Dedup.minHashSignatures(
        Seq((1L, marked(1)), (2L, marked(2))).toDF("doc_id", "text"), "doc_id", "text"),
      s"$root/epoch0", "csl_e0")
    // two stream microbatches of SURVIVORS land as increments (the
    // sink closure evaluated on batch frames — its exact contract)
    val sink = StreamingDedup.signatureIncrementSink(incDir, "doc_id", "text")
    sink(Seq(fresh(11L)).toDF("doc_id", "text"), 0L)
    sink(Seq(fresh(12L)).toDF("doc_id", "text"), 1L)
    val e1 = StreamingDedup.compactSignatureStore(
      spark, root, "csl", srcEpoch = 0, incDir = incDir, keepEpochs = 1)
    assert(e1.grams.count() == 4L, "corpus(2) + two folded increments")
    // folded increments deleted; only the new epoch dir survives
    val incLeft = new java.io.File(incDir).listFiles().map(_.getName)
      .count(_.startsWith("inc_"))
    assert(incLeft == 0, s"increments must be pruned after the fold: $incLeft left")
    val epochsLeft = new java.io.File(root).listFiles().map(_.getName).toSet
    assert(epochsLeft == Set("epoch1"), s"epochs: $epochsLeft")
    // the retired epoch's catalog registrations are DROPPED in the
    // same turn — the catalog lists ONLY live epochs' tables
    def cslTables() = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("csl_e")).toSet
    assert(cslTables() == Set("csl_e1_banded", "csl_e1_grams"),
      s"catalog after turn 1: ${cslTables()}")
    // tomorrow's increment dedups against the FOLDED corpus: a
    // near-copy of increment survivor 12 must drop
    val batch = Seq((20L, fresh(12L)._2 + " tail"), fresh(21L)).toDF("doc_id", "text")
    val kept = Dedup.nearDupNewDocs(batch, "doc_id", "text", e1, threshold = 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(21L), s"kept=$kept")
    // an IN-FLIGHT increment dir (created by the sink, not yet
    // job-committed — no _SUCCESS marker) must be invisible: the turn
    // neither folds it (it has no data yet) nor prunes it (its
    // batchId must not raise the prune cap past uncommitted work)
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(incDir, "inc_5"))
    // a turn with NOTHING landed is a no-op: same store back, no
    // copy epoch written, nothing pruned
    val same = StreamingDedup.compactSignatureStore(
      spark, root, "csl", srcEpoch = 1, incDir = incDir, keepEpochs = 1)
    assert(same.grams.count() == 4L)
    assert(new java.io.File(root).listFiles().map(_.getName).toSet == Set("epoch1"))
    assert(new java.io.File(incDir, "inc_5").isDirectory,
      "uncommitted increment must survive the turn untouched")
    // a stale HIGHER-numbered dir from an aborted run must never cause
    // the live epoch's deletion: the prune is capped at the epoch the
    // turn just wrote, so epoch99 is ignored (left as garbage) and the
    // fresh epoch2 survives and serves
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(root, "epoch99"))
    // the sink COMMITS the previously in-flight batch (Overwrite lands
    // parquet + _SUCCESS into the same inc_5 dir) — now it folds
    sink(Seq(fresh(13L)).toDF("doc_id", "text"), 5L)
    val e2 = StreamingDedup.compactSignatureStore(
      spark, root, "csl", srcEpoch = 1, incDir = incDir, keepEpochs = 1)
    assert(e2.grams.count() == 5L)
    val afterStale = new java.io.File(root).listFiles().map(_.getName).toSet
    assert(afterStale == Set("epoch2", "epoch99"), s"dirs: $afterStale")
    assert(cslTables() == Set("csl_e2_banded", "csl_e2_grams"),
      s"catalog after turn 2: ${cslTables()}")
    val kept2 = Dedup.nearDupNewDocs(
      Seq((30L, fresh(13L)._2 + " tail"), fresh(31L)).toDF("doc_id", "text"),
      "doc_id", "text", e2, threshold = 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept2 == Set(31L), s"kept2=$kept2")
    // CRASH WINDOW — an empty meta dir (a turn died DURING the meta
    // write; Spark creates the output dir at job setup) is NOT a
    // complete epoch: completeness is gated on meta/_SUCCESS, so this
    // turn must run a normal fold into the same dir instead of
    // trusting the empty meta, pruning the increment, and wedging the
    // next read
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(root, "epoch3", "meta"))
    sink(Seq(fresh(14L)).toDF("doc_id", "text"), 6L)
    val e3 = StreamingDedup.compactSignatureStore(
      spark, root, "csl", srcEpoch = 2, incDir = incDir, keepEpochs = 1)
    assert(e3.grams.count() == 6L,
      "the fold must run despite the crash-stranded empty meta dir")
    // a ZERO-ROW increment (a committed batch with no survivors)
    // folds nothing and writes no copy epoch — but the turn
    // COMPLETES: retirement runs exactly as on the other no-op
    // branches, healing a crash-stranded older epoch dir + its
    // catalog pair on THIS turn rather than the next non-empty fold
    Dedup.writeSignatures(
      Dedup.minHashSignatures(
        Seq(fresh(1L)).toDF("doc_id", "text"), "doc_id", "text"),
      s"$root/epoch2", "csl_e2") // stand-in for an unretired strand
    sink(Seq.empty[(Long, String)].toDF("doc_id", "text"), 7L)
    val still = StreamingDedup.compactSignatureStore(
      spark, root, "csl", srcEpoch = 3, incDir = incDir, keepEpochs = 1)
    assert(still.grams.count() == 6L, "zero-row turn must not write a copy epoch")
    assert(new java.io.File(incDir).listFiles().count(_.getName.startsWith("inc_")) == 0,
      "the empty increment must still prune")
    val afterZero = new java.io.File(root).listFiles().map(_.getName).toSet
    assert(afterZero == Set("epoch3", "epoch99"),
      s"zero-row turn must retire the stranded epoch 2: $afterZero")
    assert(cslTables() == Set("csl_e3_banded", "csl_e3_grams"),
      s"catalog after the zero-row turn: ${cslTables()}")
  }

  test("compactSignatureStore: every crash window resumes to the live epoch; a stale srcEpoch cannot clobber it") {
    import graft.operators.Dedup
    import graft.streaming.StreamingDedup
    def fresh(id: Long) = (id, (0 until 30).map(k => s"v${id}x$k").mkString(" "))
    val root = java.nio.file.Files.createTempDirectory("graft-cslr-root").toString
    val incDir = java.nio.file.Files.createTempDirectory("graft-cslr-inc").toString
    Dedup.writeSignatures(
      Dedup.minHashSignatures(
        Seq(fresh(1L), fresh(2L)).toDF("doc_id", "text"), "doc_id", "text"),
      s"$root/epoch0", "cslr_e0")
    val sink = StreamingDedup.signatureIncrementSink(incDir, "doc_id", "text")
    sink(Seq(fresh(11L)).toDF("doc_id", "text"), 0L)
    // CRASH WINDOW A — fold landed, increment prune did not: simulate
    // the real turn's fold step by hand (foldmark FIRST, then the
    // merge — the order compactSignatureStore uses) and leave inc_0
    // in place
    StreamingDedup.writeFoldmark(spark, s"$root/epoch1", 0L)
    Dedup.mergeSignatures(spark, s"$root/epoch0", "cslr_e0",
      spark.read.parquet(s"$incDir/inc_0"), s"$root/epoch1", "cslr_e1")
    val resumedA = StreamingDedup.compactSignatureStore(
      spark, root, "cslr", srcEpoch = 0, incDir = incDir, keepEpochs = 1)
    assert(resumedA.grams.count() == 3L, "resume must hand back the folded epoch 1")
    assert(new java.io.File(incDir).listFiles().count(_.getName.startsWith("inc_")) == 0,
      "resume must prune the already-folded increment")
    assert(new java.io.File(root).listFiles().map(_.getName).toSet == Set("epoch1"),
      "resume must finish epoch retirement")
    // CRASH WINDOW B — fold + increment prune landed, retirement did
    // not: re-create epoch0 artificially to stand for the unretired
    // dir, then re-run the turn with NO increments listed
    Dedup.writeSignatures(
      Dedup.minHashSignatures(
        Seq(fresh(1L), fresh(2L)).toDF("doc_id", "text"), "doc_id", "text"),
      s"$root/epoch0", "cslr_e0")
    val resumedB = StreamingDedup.compactSignatureStore(
      spark, root, "cslr", srcEpoch = 0, incDir = incDir, keepEpochs = 1)
    assert(resumedB.grams.count() == 3L,
      "no-increment re-run with a complete next epoch must return the LIVE epoch 1, " +
        "not resurrect epoch 0")
    assert(new java.io.File(root).listFiles().map(_.getName).toSet == Set("epoch1"))
    // STALE CALLER — the live store is epoch 1; a NEW increment lands
    // and someone re-runs with srcEpoch = 0: the fold would clobber
    // epoch 1, so the turn must refuse actionably
    sink(Seq(fresh(12L)).toDF("doc_id", "text"), 1L)
    val e = intercept[IllegalArgumentException] {
      StreamingDedup.compactSignatureStore(
        spark, root, "cslr", srcEpoch = 0, incDir = incDir, keepEpochs = 1)
    }
    assert(e.getMessage.contains("stale"), e.getMessage)
    // and the CORRECT turn from the live epoch still folds normally
    val e2 = StreamingDedup.compactSignatureStore(
      spark, root, "cslr", srcEpoch = 1, incDir = incDir, keepEpochs = 1)
    assert(e2.grams.count() == 4L)
    // DEADLOCK SCENARIO — a crashed turn folded inc_2 into epoch 3,
    // and inc_3 landed before the recovery re-run. srcEpoch=2 sees
    // the complete epoch 3 whose foldmark (2) predates inc_3 → stale
    // error; the ADVISED re-run from the live epoch (3) must fold
    // ONLY inc_3 (inc_2 is at or under epoch 3's foldmark — already
    // folded) instead of deadlocking on mergeSignatures'
    // id-disjointness check
    sink(Seq(fresh(13L)).toDF("doc_id", "text"), 2L)
    StreamingDedup.writeFoldmark(spark, s"$root/epoch3", 2L)
    Dedup.mergeSignatures(spark, s"$root/epoch2", "cslr_e2",
      spark.read.parquet(s"$incDir/inc_2"), s"$root/epoch3", "cslr_e3")
    sink(Seq(fresh(14L)).toDF("doc_id", "text"), 3L)
    val e3 = intercept[IllegalArgumentException] {
      StreamingDedup.compactSignatureStore(
        spark, root, "cslr", srcEpoch = 2, incDir = incDir, keepEpochs = 1)
    }
    assert(e3.getMessage.contains("stale"), e3.getMessage)
    val live = StreamingDedup.compactSignatureStore(
      spark, root, "cslr", srcEpoch = 3, incDir = incDir, keepEpochs = 1)
    assert(live.grams.count() == 6L, "4 standing + doc 13 (crashed fold) + doc 14 (fresh)")
    assert(live.grams.filter("id = 13").count() == 1L,
      "the already-folded increment's doc must appear exactly once, not re-folded")
    assert(new java.io.File(incDir).listFiles().count(_.getName.startsWith("inc_")) == 0)
    assert(new java.io.File(root).listFiles().map(_.getName).toSet == Set("epoch4"))
    // catalog heals to exactly the live epoch set — including strands
    // from the earlier simulated crashes (retirement is a
    // catalog-vs-directory diff, not drop-what-this-turn-deleted)
    val regs = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("cslr_e")).toSet
    assert(regs == Set("cslr_e4_banded", "cslr_e4_grams"), s"catalog: $regs")
    // CRASH WINDOW C — foldmark landed but the merge did not (no meta
    // in epoch5): the foldmark is untrusted while the epoch is
    // incomplete, so the re-run overwrites it and folds normally
    sink(Seq(fresh(15L)).toDF("doc_id", "text"), 4L)
    StreamingDedup.writeFoldmark(spark, s"$root/epoch5", 4L)
    val resumedC = StreamingDedup.compactSignatureStore(
      spark, root, "cslr", srcEpoch = 4, incDir = incDir, keepEpochs = 1)
    assert(resumedC.grams.count() == 7L,
      "an incomplete epoch's foldmark must not suppress the fold")
    assert(new java.io.File(root).listFiles().map(_.getName).toSet == Set("epoch5"))
  }

  test("dedupStreamTws: retention follows the watermark delay — a duplicate past the horizon is re-admitted") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStreams
    val text = "the quick brown fox jumps over the lazy dog tonight again"
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:00:00").getTime
    def row(id: Long, sec: Long, t: String) = (id, new java.sql.Timestamp(t0 + sec * 1000), t)
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    val q = EventStreams
      .dedupStreamTws(in.toDS().toDF("doc_id", "ts", "text"), "doc_id", "ts", "text",
        watermarkDelay = "10 seconds")
      .writeStream.format("memory").queryName("dedup_tws_horizon").outputMode("append").start()
    try {
      // first occurrence kept; an in-horizon duplicate dropped
      in.addData(row(1L, 0, text), row(2L, 1, text))
      q.processAllAvailable()
      // advance the watermark far past first-seen + delay (0s + 10s) —
      // one batch to move the watermark, one more so the fingerprint's
      // GC timer has fired before the re-arrival's batch
      in.addData(row(9L, 100, "completely different filler content here"))
      q.processAllAvailable()
      in.addData(row(8L, 101, "yet more unrelated filler content rows"))
      q.processAllAvailable()
      // the same text arriving after the horizon is RE-ADMITTED —
      // dropDuplicatesWithinWatermark's retention rule, which the TWS
      // face must mirror (state must not slide out from duplicates)
      in.addData(row(3L, 95, text))
      q.processAllAvailable()
      val ids = spark.table("dedup_tws_horizon").select($"doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 9L, 8L, 3L), s"ids=$ids")
    } finally {
      q.stop()
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("nearDupSuppress: in-stream victim removal via chained transformWithState, stream ≡ batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingDedup
    val base = "the quick brown fox jumps over the lazy dog while seventy owls " +
      "watch from nearby trees and comment on the unfolding chase below them"
    val other = "completely different content about distributed query engines " +
      "shuffles partitions and adaptive execution plans at larger corpus scale"
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 09:00:00").getTime
    def ts(s: Long) = new java.sql.Timestamp(t0 + s * 1000)
    val batch1 = Seq((1L, ts(0), base), (3L, ts(1), other))
    // 2 near-dups 1 (suppressed); 4 fresh; 5 shingle-less passthrough;
    // 6 near-dups the SUPPRESSED 2 — transitive chains must die too
    val batch2 = Seq(
      (2L, ts(10), base + " tonight"),
      (4L, ts(11), (0 until 30).map(k => s"u4x$k").mkString(" ")),
      (5L, ts(12), "hi there"),
      (6L, ts(13), base + " tonight again"),
    )
    val allRows = batch1 ++ batch2
    val expected = Set(1L, 3L, 4L, 5L)

    val batchKept = StreamingDedup
      .nearDupSuppress(allRows.toDF("doc_id", "ts", "text"), "doc_id", "ts", "text",
        estThreshold = 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(batchKept == expected, s"batch: $batchKept")

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    val q = StreamingDedup
      .nearDupSuppress(in.toDS().toDF("doc_id", "ts", "text"), "doc_id", "ts", "text",
        estThreshold = 0.5)
      .writeStream.format("memory").queryName("suppress_stream").outputMode("append").start()
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      val afterB1 = spark.table("suppress_stream").select($"doc_id").as[Long].collect().toSet
      assert(afterB1 == Set(1L, 3L), s"after batch 1: $afterB1")
      in.addData(batch2: _*) // collision state must persist across triggers
      q.processAllAvailable()
      val streamKept = spark.table("suppress_stream").select($"doc_id").as[Long].collect().toSet
      assert(streamKept == batchKept, s"stream=$streamKept batch=$batchKept")
      // payload fidelity: the kept rows carry the original columns verbatim
      val kept4 = spark.table("suppress_stream").where($"doc_id" === 4L)
        .select($"text").as[String].collect().toSeq
      assert(kept4 == Seq((0 until 30).map(k => s"u4x$k").mkString(" ")))
    } finally {
      q.stop()
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("inlineDedupAndCap: four chained stateful operators — exact, near-dup, cap — stream ≡ batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingWebIngest
    val base = "the quick brown fox jumps over the lazy dog while seventy owls " +
      "watch from nearby trees and comment on the unfolding chase below them"
    def uniq(i: Int) = (0 until 30).map(k => s"u${i}x$k").mkString(" ")
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 09:00:00").getTime
    def ts(s: Long) = new java.sql.Timestamp(t0 + s * 1000)
    val batch1 = Seq(
      (1L, ts(1), base, "a"),
      (2L, ts(2), base, "a"), // exact dup of 1 → exact stage
      (3L, ts(3), base + " tonight", "a"), // near-dup of 1 → suppress stage
      (10L, ts(7), uniq(10), "b"))
    val batch2 = Seq(
      (4L, ts(4), uniq(4), "a"),
      (5L, ts(5), uniq(5), "a"),
      (6L, ts(6), uniq(6), "a"), // 4th admit on host a → cap 3 bites
      (11L, ts(8), "hi x", "b"), // shingle-less, unique → passes
      (12L, ts(9), "hi x", "b")) // shingle-less EXACT dup → only the exact stage can catch it
    val allRows = batch1 ++ batch2
    val expected = Set(1L, 4L, 5L, 10L, 11L)
    val batchKept = StreamingWebIngest
      .inlineDedupAndCap(allRows.toDF("doc_id", "ts", "text", "host"),
        "doc_id", "ts", "text", "host", maxPerHost = 3, estThreshold = 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(batchKept == expected, s"batch: $batchKept")

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[(Long, java.sql.Timestamp, String, String)](spark)
    val q = StreamingWebIngest
      .inlineDedupAndCap(in.toDS().toDF("doc_id", "ts", "text", "host"),
        "doc_id", "ts", "text", "host", maxPerHost = 3, estThreshold = 0.5)
      .writeStream.format("memory").queryName("inline_chain").outputMode("append").start()
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2: _*) // budget + collision state must persist across triggers
      q.processAllAvailable()
      val streamKept = spark.table("inline_chain").select($"doc_id").as[Long].collect().toSet
      assert(streamKept == batchKept, s"stream=$streamKept batch=$batchKept")
    } finally {
      q.stop()
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("webIngestStreamInline: front end + fully in-stream dedup chain, stream ≡ batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingWebIngest
    import graft.streaming.StreamingWebIngest.WebDoc
    val prose = "the data and model pipeline have that sort of careful work " +
      "to be done with many diverse sources and long running jobs "
    def distinctProse(i: Int) = (prose * 3).trim.split(" ").zipWithIndex
      .map { case (w, j) => if (j % 4 == 3) s"$w$i" else w }.mkString(" ")
    def page(body: String) =
      s"<html><body><p>$body</p></body></html>"
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:00:00").getTime
    def doc(id: Long, sec: Long, body: String, url: String) =
      WebDoc(id, new java.sql.Timestamp(t0 + sec * 1000), page(body), url)
    val batch1 = Seq(
      doc(1L, 1, distinctProse(1), "http://a.com/p1"),
      doc(10L, 2, distinctProse(10), "http://b.com/x"))
    val batch2 = Seq(
      doc(2L, 3, distinctProse(1) + " tonight", "http://a.com/p2"), // near-dup of 1: IN-STREAM suppressed
      doc(11L, 4, distinctProse(10), "http://b.com/y"), // exact dup of 10
      doc(12L, 5, Seq.fill(60)("### 12345 …").mkString(" "), "http://b.com/junk"),
      doc(3L, 6, distinctProse(3), "http://a.com/p3"))
    val curate = (df: org.apache.spark.sql.DataFrame) => StreamingWebIngest
      .webIngestStreamInline(df, "doc_id", "ts", "html", "url",
        langs = Seq("en"), maxPerHost = 2, estThreshold = 0.5)
    val batchKept = curate((batch1 ++ batch2).toDF())
      .select($"id").as[Long].collect().toSet
    assert(batchKept == Set(1L, 3L, 10L), s"batch: $batchKept")

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[WebDoc](spark)
    val q = curate(in.toDS().toDF())
      .writeStream.format("memory").queryName("inline_ingest").outputMode("append").start()
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2: _*)
      q.processAllAvailable()
      val streamKept = spark.table("inline_ingest").select($"id").as[Long].collect().toSet
      assert(streamKept == batchKept,
        s"stream=$streamKept batch=$batchKept — the near-dup victim must be gone IN-STREAM")
    } finally {
      q.stop()
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("observeCorpusMetrics: per-microbatch docs/tokens/chars ride the query progress") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingWebIngest
    val in = MemoryStream[(Long, String)](spark)
    val q = StreamingWebIngest
      .observeCorpusMetrics(in.toDS().toDF("doc_id", "text"), "curated")
      .writeStream.format("memory").queryName("observed_stream").outputMode("append").start()
    try {
      in.addData((1L, "three token doc"), (2L, "two tokens"))
      q.processAllAvailable()
      val metrics = q.recentProgress
        .flatMap(p => Option(p.observedMetrics.get("curated")))
        .lastOption
        .getOrElse(fail("no observed metrics in progress"))
      assert(metrics.getAs[Long]("n_docs") == 2L)
      assert(metrics.getAs[Long]("n_tokens") == 5L)
      assert(metrics.getAs[Long]("n_chars") == "three token doc".length + "two tokens".length)
    } finally q.stop()
  }

  test("signatureIncrementSink: streamed epochs fold into a store that flags later near-dups") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingDedup
    val base = "the data and model pipeline have that sort of careful work " +
      "to be done with many diverse sources and long running jobs"
    def uniq(i: Int) = (0 until 30).map(k => s"s${i}x$k").mkString(" ")
    val dir = Files.createTempDirectory("graft-sig-inc").toString
    val in = MemoryStream[(Long, String)](spark)
    val q = in.toDS().toDF("doc_id", "text")
      .writeStream
      .foreachBatch(StreamingDedup.signatureIncrementSink(dir, "doc_id", "text"))
      .start()
    try {
      in.addData((1L, base), (2L, uniq(2)))
      q.processAllAvailable()
      in.addData((3L, uniq(3))) // second epoch
      q.processAllAvailable()
    } finally q.stop()
    val inc = StreamingDedup.readSignatureIncrements(spark, dir)
    assert(inc.count() == 3L, "both epochs land")
    // fold the increments into a bucketed store; a later stream's
    // near-copy of a streamed doc must hit it
    val storeDir = Files.createTempDirectory("graft-sig-inc-store").toString
    graft.operators.Dedup.writeSignatures(inc, storeDir, "sig_inc_store")
    val store = graft.operators.Dedup.readSignatures(spark, storeDir, "sig_inc_store")
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:00:00")
    val hits = StreamingDedup
      .corpusNearDupHits(
        Seq((10L, t0, base + " tonight"), (11L, t0, uniq(11))).toDF("doc_id", "ts", "text"),
        "doc_id", "ts", "text", store, threshold = 0.5)
      .toDF().select($"id", $"corpus_id").distinct().as[(Long, Long)].collect().toSet
    assert(hits == Set((10L, 1L)), s"lambda loop: $hits")
    // empty dir → schema-correct empty frame
    val emptyDir = Files.createTempDirectory("graft-sig-inc-empty").toString
    val empty = StreamingDedup.readSignatureIncrements(spark, emptyDir)
    assert(empty.isEmpty && empty.columns.toSeq == Seq("id", "sig", "grams"))
    // post-compaction pruning: folded epochs delete, later ones remain
    assert(StreamingDedup.pruneSignatureIncrements(spark, dir, upToBatchId = 0L) == 1)
    assert(StreamingDedup.readSignatureIncrements(spark, dir).count() == 1L,
      "epoch 1 survives the prune of epoch 0")
    assert(StreamingDedup.pruneSignatureIncrements(spark, emptyDir, 99L) == 0)
  }

  test("observeCorpusMetrics composes with the chained-TWS suppression plan") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{StreamingDedup, StreamingWebIngest}
    val base = "the quick brown fox jumps over the lazy dog while seventy owls " +
      "watch from nearby trees and comment on the unfolding chase below them"
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 09:00:00").getTime
    val rows = Seq(
      (1L, new java.sql.Timestamp(t0), base),
      (2L, new java.sql.Timestamp(t0 + 5000), base + " tonight"), // suppressed
      (3L, new java.sql.Timestamp(t0 + 9000),
        (0 until 30).map(k => s"o3x$k").mkString(" ")))
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    // observe BEFORE the stateful chain (input volume) and AFTER it
    // (kept volume) — both CollectMetrics nodes must coexist with the
    // multi-stateful TWS plan
    val observed = StreamingWebIngest.observeCorpusMetrics(
      in.toDS().toDF("doc_id", "ts", "text"), "ingest_in")
    val kept = StreamingDedup
      .nearDupSuppress(observed, "doc_id", "ts", "text", estThreshold = 0.5)
    val q = StreamingWebIngest.observeCorpusMetrics(kept, "ingest_kept")
      .writeStream.format("memory").queryName("observed_chain").outputMode("append").start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      val out = spark.table("observed_chain").select($"doc_id").as[Long].collect().toSet
      assert(out == Set(1L, 3L), s"suppression still works under observe: $out")
      // scan ALL progress entries — the final empty microbatch also
      // reports (zeros), so the data batch's metrics are not last
      def all(n: String) = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get(n)))
        .map(_.getAs[Long]("n_docs"))
      assert(all("ingest_in").contains(3L), s"in: ${all("ingest_in")}")
      assert(all("ingest_kept").contains(2L), s"kept: ${all("ingest_kept")}")
    } finally {
      q.stop()
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("WARC files streaming into webIngestStream: the source-to-pipeline seam, stream ≡ batch") {
    import graft.sources.Warc
    import graft.streaming.StreamingWebIngest
    val prose = "the data and model pipeline have that sort of careful work " +
      "to be done with many diverse sources and long running jobs "
    def distinctProse(i: Int) = (prose * 3).trim.split(" ").zipWithIndex
      .map { case (w, j) => if (j % 4 == 3) s"$w$i" else w }.mkString(" ")
    def page(body: String) = s"<html><body><p>$body</p></body></html>"
    val recs = Seq(
      ("http://a.com/doc/1", "2024-06-01T10:00:01Z", page(distinctProse(1))),
      ("http://a.com/doc/2", "2024-06-01T10:00:02Z", page(distinctProse(2))),
      ("http://b.com/doc/3", "2024-06-01T10:00:03Z", page(distinctProse(1)))) // near-dup of 1
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-seam")
    java.nio.file.Files.write(dir.resolve("crawl.warc.gz"),
      Warc.buildWarc(recs, gzipPerRecord = true))
    // the documented composition: response rows become (id, ts, html, url)
    def asDocs(df: org.apache.spark.sql.DataFrame) = df
      .where($"warc_type" === "response")
      .select(
        regexp_extract($"url", "/doc/(\\d+)$", 1).cast("long").as("doc_id"),
        to_timestamp($"warc_date").as("ts"),
        $"body".as("html"), $"url")
    val q = StreamingWebIngest
      .webIngestStream(asDocs(Warc.readStream(spark, dir.toString)),
        "doc_id", "ts", "html", "url", langs = Seq("en"))
      .writeStream.format("memory").queryName("warc_seam").outputMode("append").start()
    try {
      q.processAllAvailable()
      val stream = spark.table("warc_seam")
        .select($"id", $"url_host").as[(Long, String)].collect().toSet
      val batch = StreamingWebIngest
        .webIngestStream(asDocs(Warc.read(spark, dir.toString + "/*")),
          "doc_id", "ts", "html", "url", langs = Seq("en"))
        .select($"id", $"url_host").as[(Long, String)].collect().toSet
      assert(stream == batch, s"stream=$stream batch=$batch")
      assert(stream == Set((1L, "a.com"), (2L, "a.com")),
        s"near-dup 3 must drop (keep-min), 1 and 2 survive: $stream")
    } finally q.stop()
  }

  test("webIngestStream mainContent/stripTracking: stream ≡ batch, nav dropped, campaign URLs collapse") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingWebIngest
    import graft.streaming.StreamingWebIngest.WebDoc
    val prose = "the data and model pipeline have that sort of careful work " +
      "to be done with many diverse sources and long running jobs "
    def distinctProse(i: Int) = (prose * 3).trim.split(" ").zipWithIndex
      .map { case (w, j) => if (j % 4 == 3) s"$w$i" else w }.mkString(" ")
    def page(body: String) = "<html><body>" +
      "<div><a href='/'>Home</a> <a href='/b'>Blog</a> <a href='/c'>Shop</a></div>" +
      s"<p>$body</p><div><a>Privacy</a> | <a>Terms</a></div></body></html>"
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:00:00").getTime
    val rows = Seq(
      // same page crawled twice via different campaigns: tracking
      // stripped BEFORE dedup keys form → identical text + one
      // url_norm; the exact-dup stage keeps the first arrival
      WebDoc(80L, new java.sql.Timestamp(t0 + 1000), page(distinctProse(1)),
        "http://a.com/art?id=7&utm_source=mail"),
      WebDoc(81L, new java.sql.Timestamp(t0 + 2000), page(distinctProse(1)),
        "http://a.com/art?id=7&utm_source=feed&gclid=g1"),
      WebDoc(82L, new java.sql.Timestamp(t0 + 3000), page(distinctProse(2)),
        "http://a.com/other?id=8"))
    val in = MemoryStream[WebDoc](spark)
    val q = StreamingWebIngest
      .webIngestStream(in.toDS().toDF(), "doc_id", "ts", "html", "url",
        langs = Seq("en"), mainContent = true, stripTracking = true)
      .writeStream.format("memory").queryName("wis_main").outputMode("append").start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      val stream = spark.table("wis_main").select($"id", $"url_norm", $"text")
        .as[(Long, String, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(stream.keySet == Set(80L, 82L), s"stream: ${stream.keySet}")
      assert(stream(80L)._1 == "http://a.com/art?id=7", "tracking params stripped")
      assert(!stream(80L)._2.contains("Privacy") && !stream(80L)._2.contains("Home"),
        s"nav/footer dropped: ${stream(80L)._2}")
      val batch = StreamingWebIngest
        .webIngestStream(rows.toDF(), "doc_id", "ts", "html", "url",
          langs = Seq("en"), mainContent = true, stripTracking = true)
        .select($"id", $"url_norm", $"text")
        .as[(Long, String, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(batch == stream, "batch evaluation of the mainContent/stripTracking face must agree")
    } finally q.stop()
  }

  test("null-ts poison rows are dropped at the stateful face boundary, not a query crash") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:00:00").getTime
    def ev(id: Long, offsetSec: Long, tpe: String) =
      EventStreams.Event(id, new java.sql.Timestamp(t0 + offsetSec * 1000), 1L, tpe, id.toDouble)
    def poison(id: Long, tpe: String) =
      EventStreams.Event(id, null, 1L, tpe, id.toDouble)

    // as-of: a null-ts right would NPE in the per-key step (and could
    // never be ordered against the watermark); a null-ts left has no
    // timeline slot to emit in — both must vanish, the query must live
    val lefts = MemoryStream[EventStreams.Event](spark)
    val rights = MemoryStream[EventStreams.Event](spark)
    val q = EventStreams
      .asofBackwardStream(lefts.toDS(), rights.toDS(), watermarkDelay = "1 hour")
      .writeStream.format("memory").queryName("asof_nullts").outputMode("append").start()
    try {
      rights.addData(poison(900L, "view"), ev(100L, 10, "view"))
      lefts.addData(poison(901L, "purchase"), ev(1L, 20, "purchase"))
      q.processAllAvailable()
      val got = spark.table("asof_nullts")
        .select($"event_id", $"asof_event_id")
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      assert(got == Map(1L -> Some(100L)), s"poison rows must vanish, real rows match: $got")
    } finally q.stop()

    // sessionization: same contract on the fMGWS event-time face
    val in = MemoryStream[EventStreams.Event](spark)
    val qs = EventStreams
      .sessionizeStreamEventTime(in.toDS(), gapSeconds = 60L, watermarkDelay = "1 hour")
      .writeStream.format("memory").queryName("sess_nullts").outputMode("append").start()
    try {
      in.addData(ev(10L, 0, "view"), poison(902L, "view"), ev(11L, 30, "view"))
      qs.processAllAvailable()
      val got = spark.table("sess_nullts")
        .select($"event_id", $"session_seq")
        .as[(Long, Long)].collect().toMap
      assert(got == Map(10L -> 1L, 11L -> 1L), s"session face: $got")
    } finally qs.stop()
  }

  test("null-ts poison rows: the DOC faces drop them at the boundary too (TWS state ops, batch twins)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{EventStreams, StreamingDedup, StreamingWebIngest}
    val base = "the quick brown fox jumps over the lazy dog while seventy owls " +
      "watch from nearby trees and comment on the unfolding chase below them"
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 09:00:00").getTime
    def ts(s: Long) = new java.sql.Timestamp(t0 + s * 1000)
    val nullTs = null.asInstanceOf[java.sql.Timestamp]

    // batch twins agree with the streaming drop rule: a null-ts row
    // must not open a phantom session, win keep-first, or take a cap slot
    val sess = EventStreams
      .sessionize(Seq((900L, nullTs, 7L), (10L, ts(0), 7L), (11L, ts(10), 7L))
        .toDF("event_id", "ts", "user_id"), gapSeconds = 5L)
      .select($"event_id", $"session_seq").as[(Long, Long)].collect().toMap
    assert(sess == Map(10L -> 1L, 11L -> 2L), s"batch sessionize ordinals unshifted: $sess")
    val dedupB = EventStreams
      .dedupStream(Seq((900L, nullTs, base), (1L, ts(0), base)).toDF("doc_id", "ts", "text"),
        "ts", "text")
      .select($"doc_id").as[Long].collect().toSet
    assert(dedupB == Set(1L), s"null-ts copy must not win keep-first: $dedupB")
    val capB = StreamingWebIngest
      .capPerHostStream(
        Seq((900L, nullTs, "h1"), (1L, ts(0), "h1"), (2L, ts(1), "h1"))
          .toDF("doc_id", "ts", "host"), "doc_id", "ts", "host", maxPerHost = 2)
      .select($"doc_id").as[Long].collect().toSet
    assert(capB == Set(1L, 2L), s"null-ts row must not take a cap slot: $capB")
    val hitsB = StreamingDedup
      .nearDupHits(Seq((900L, nullTs, base), (1L, ts(0), base), (2L, ts(1), base + " tonight"))
        .toDF("doc_id", "ts", "text"), "doc_id", "ts", "text", estThreshold = 0.5)
      .select($"id_a", $"victim_id").as[(Long, Long)].collect().toSet
    assert(hitsB == Set((1L, 2L)), s"batch nearDupHits ignores the null-ts copy: $hitsB")

    // streaming: the same poison rows reach the TWS processors'
    // sortBy(ts.getTime) unless the boundary drops them — feed them in
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    val q = EventStreams
      .dedupStreamTws(in.toDS().toDF("doc_id", "ts", "text"), "doc_id", "ts", "text")
      .writeStream.format("memory").queryName("dedup_tws_nullts").outputMode("append").start()
    val in2 = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    val q2 = StreamingDedup
      .nearDupSuppress(in2.toDS().toDF("doc_id", "ts", "text"), "doc_id", "ts", "text",
        estThreshold = 0.5)
      .writeStream.format("memory").queryName("suppress_nullts").outputMode("append").start()
    try {
      in.addData((900L, nullTs, base), (1L, ts(0), base))
      q.processAllAvailable()
      val ids = spark.table("dedup_tws_nullts").select($"doc_id").as[Long].collect().toSet
      assert(ids == Set(1L), s"dedupStreamTws: $ids")
      in2.addData((900L, nullTs, base), (1L, ts(0), base), (2L, ts(1), base + " tonight"))
      q2.processAllAvailable()
      val kept = spark.table("suppress_nullts").select($"doc_id").as[Long].collect().toSet
      assert(kept == Set(1L), s"nearDupSuppress drops the poison row and the near-dup: $kept")
    } finally {
      q.stop(); q2.stop()
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("decontaminateSpans: broadcast-pool excision runs in a streaming plan and equals batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Dedup
    // the pool side is a bounded BATCH frame (the decontaminate
    // contract); the corpus side is a pure per-row kernel, so the
    // same call works on a streaming DataFrame — live-ingest surgery
    val bench = Seq(Tuple1("alpha beta gamma delta epsilon")).toDF("text")
    val rows = Seq(
      (1L, "one two three alpha beta gamma delta epsilon four five six"),
      (2L, "clean content with nothing quoted from any benchmark here"),
      (3L, null.asInstanceOf[String]))
    val batch = Dedup
      .decontaminateSpans(rows.toDF("doc_id", "text"), bench, "text", "text", n = 5)
      .select($"doc_id", $"clean_text", $"n_excised_tokens")
      .collect().map(_.toSeq).toSet
    val in = MemoryStream[(Long, String)](spark)
    val q = Dedup
      .decontaminateSpans(in.toDS().toDF("doc_id", "text"), bench, "text", "text", n = 5)
      .select($"doc_id", $"clean_text", $"n_excised_tokens")
      .writeStream.format("memory").queryName("decontam_stream")
      .outputMode("append").start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty, "excision must stay stateless in-stream")
      val streamed = spark.table("decontam_stream").collect().map(_.toSeq).toSet
      assert(streamed == batch, s"stream≡batch excision mismatch: $streamed vs $batch")
    } finally q.stop()
  }

  test("decontaminateSpansWithPool: a LOADED frozen pool excises in-stream, equals batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.{Dedup, IndexStore}
    // the serving contract: fit the pool once, persist it, and the
    // loaded model runs the same stateless surgery inside a streaming
    // plan — no benchmark re-scan per job or per microbatch
    val bench = Seq(Tuple1("alpha beta gamma delta epsilon")).toDF("text")
    val dir = java.nio.file.Files.createTempDirectory("graft-pool-stream").toString
    IndexStore.saveShinglePool(spark, Dedup.fitShinglePool(bench, "text", n = 5), dir)
    val pool = IndexStore.loadShinglePool(spark, dir)
    val rows = Seq(
      (1L, "one two three alpha beta gamma delta epsilon four five six"),
      (2L, "clean content with nothing quoted from any benchmark here"))
    val batch = Dedup
      .decontaminateSpansWithPool(rows.toDF("doc_id", "text"), pool, "text")
      .select($"doc_id", $"clean_text", $"n_excised_tokens")
      .collect().map(_.toSeq).toSet
    val in = MemoryStream[(Long, String)](spark)
    val q = Dedup
      .decontaminateSpansWithPool(in.toDS().toDF("doc_id", "text"), pool, "text")
      .select($"doc_id", $"clean_text", $"n_excised_tokens")
      .writeStream.format("memory").queryName("pool_stream")
      .outputMode("append").start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "pool-served excision must stay stateless in-stream")
      val streamed = spark.table("pool_stream").collect().map(_.toSeq).toSet
      assert(streamed == batch, s"loaded-pool stream≡batch mismatch: $streamed vs $batch")
    } finally q.stop()
  }

  test("applyHashIdf: frozen-model embedding runs in a streaming plan and equals batch across microbatches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.TextAnalysis
    // fit on a standing corpus; stream a SECOND batch through the
    // frozen model — statelessness is the point (the refitting
    // hashEmbedIdf face cannot run here: its corpus aggregate has no
    // streaming plan), so the stream must emit bit-identical vectors
    // to the batch face row-for-row, across microbatch boundaries
    val bp = (0 until 20).map(k => s"base$k").mkString(" ")
    val standing = (1 to 10).map(i =>
      (i.toLong, bp + " " + (0 until 5).map(k => s"w${i}x$k").mkString(" ")))
      .toDF("id", "text")
    val model = TextAnalysis.fitHashIdf(standing, "text", dim = 128, ngrams = 2)
    val rows = (11 to 16).map(i =>
      (i.toLong, bp + " " + (0 until 5).map(k => s"w${i}x$k").mkString(" "))) :+
      (17L, null.asInstanceOf[String]) // null text flows through as null embedding
    val batch = TextAnalysis
      .applyHashIdf(rows.toDF("id", "text"), "text", model)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) null else r.getSeq[Float](2)))
      .toMap
    val in = MemoryStream[(Long, String)](spark)
    val q = TextAnalysis
      .applyHashIdf(in.toDS().toDF("id", "text"), "text", model)
      .writeStream.format("memory").queryName("hashidf_stream")
      .outputMode("append").start()
    try {
      in.addData(rows.take(3): _*)
      q.processAllAvailable()
      in.addData(rows.drop(3): _*)
      q.processAllAvailable()
      val streamed = spark.table("hashidf_stream")
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(2)) null else r.getSeq[Float](2)))
        .toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (id, v) =>
        assert(v == batch(id), s"stream≡batch embedding mismatch for id $id")
      }
    } finally q.stop()
  }
}
