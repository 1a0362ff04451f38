package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Events
import graft.streaming.EventStream

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def ev(rows: (Long, String, Long, String, Double)*) =
    rows.toDF("event_id", "ts0", "user_id", "event_type", "value")
      .select($"event_id", to_timestamp($"ts0").as("ts"), $"user_id", $"event_type", $"value",
        lit("{}").as("props"))

  test("sessionize: gap strictly greater than the threshold starts a new session") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", 7L, "view", 1.0),
      (2L, "2024-01-01 10:30:00", 7L, "view", 2.0),  // gap == 30min → same session
      (3L, "2024-01-01 11:00:01", 7L, "view", 3.0),  // gap 30m01s → new session
      (4L, "2024-01-01 12:00:00", 8L, "view", 4.0))  // other user
    val out = Events.sessionize(df, 30)
      .orderBy("user_id", "session_no")
      .select("user_id", "session_no", "n_events", "total_value")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.toSeq == Seq((7L, 1L, 2L, 3.0), (7L, 2L, 1L, 3.0), (8L, 1L, 1L, 4.0)))
  }

  test("funnel: steps count only strictly-after completions, in order") {
    val df = ev(
      // user 1 converts the full funnel in order
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 10:01:00", 1L, "click", 0.0),
      (3L, "2024-01-01 10:02:00", 1L, "purchase", 0.0),
      // user 2's click PRECEDES their first view — click step must not count
      (4L, "2024-01-01 10:00:00", 2L, "click", 0.0),
      (5L, "2024-01-01 10:01:00", 2L, "view", 0.0),
      (6L, "2024-01-01 10:02:00", 2L, "purchase", 0.0),
      // user 3 purchases without ever clicking — purchase step must not count
      (7L, "2024-01-01 10:00:00", 3L, "view", 0.0),
      (8L, "2024-01-01 10:01:00", 3L, "purchase", 0.0))
    val out = Events.funnel(df, Seq("view", "click", "purchase"))
      .orderBy("step_no")
      .select("step_no", "step", "users")
      .as[(Int, String, Long)].collect().toSeq
    assert(out == Seq((1, "view", 3L), (2, "click", 1L), (3, "purchase", 1L)))
  }

  test("retention: cohort is the first-activity week, offsets count active users") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0), // Mon wk0 — cohort 2024-01-01
      (2L, "2024-01-08 10:00:00", 1L, "view", 0.0), // wk1
      (3L, "2024-01-15 10:00:00", 1L, "view", 0.0), // wk2
      (4L, "2024-01-08 11:00:00", 2L, "view", 0.0), // cohort 2024-01-08
      (5L, "2024-01-15 11:00:00", 2L, "view", 0.0)) // wk1 of that cohort
    val out = Events.retention(df)
      .orderBy("cohort", "offset")
      .select(col("cohort").cast("string"), col("offset"), col("users"))
      .as[(String, Int, Long)].collect().toSeq
    assert(out == Seq(
      ("2024-01-01", 0, 1L), ("2024-01-01", 1, 1L), ("2024-01-01", 2, 1L),
      ("2024-01-08", 0, 1L), ("2024-01-08", 1, 1L)))
  }

  test("windowedAgg: tumbling hour windows with money-exact totals") {
    val df = ev(
      (1L, "2024-01-01 10:05:00", 1L, "view", 1.10),
      (2L, "2024-01-01 10:55:00", 1L, "view", 2.20),
      (3L, "2024-01-01 11:05:00", 1L, "click", 5.00))
    val out = Events.windowedAgg(df, "1 hour")
      .orderBy("window_start", "event_type")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("2024-01-01 10:00:00.0", "view", 2L, 3.30),
      ("2024-01-01 11:00:00.0", "click", 1L, 5.00)))
  }

  test("asOfJoin: latest prior right row per key, null when nothing precedes") {
    val purchases = ev(
      (10L, "2024-01-01 09:00:00", 1L, "purchase", 5.0),  // before any view → null
      (11L, "2024-01-01 10:30:00", 1L, "purchase", 6.0),  // after views A,B → B
      (12L, "2024-01-01 10:05:00", 2L, "purchase", 7.0))  // other user → C
      .select("event_id", "user_id", "ts", "value")
    val views = ev(
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),  // A
      (2L, "2024-01-01 10:10:00", 1L, "view", 0.0),  // B
      (3L, "2024-01-01 10:05:00", 2L, "view", 0.0))  // C
      .select($"user_id", $"ts", $"event_id".as("view_event"))
    val out = Events.asOfJoin(purchases, views, "user_id", "ts",
        rightPayload = Seq("view_event"), rightTiebreak = Seq("view_event"))
      .orderBy("event_id")
      .select("event_id", "view_event")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    // purchase 12 at the SAME instant as view C matches it (ts >= semantics)
    assert(out.toSeq == Seq((10L, -1L), (11L, 2L), (12L, 3L)))
  }

  test("sessionizeNative: exact-gap events merge (same boundary as sessionize), end = last+gap") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", 7L, "view", 1.0),
      (2L, "2024-01-01 10:30:00", 7L, "view", 2.0),  // gap == 30min → still merges
      (3L, "2024-01-01 11:00:01", 7L, "view", 4.0),  // gap 30m01s → new session
      (4L, "2024-01-01 12:00:00", 8L, "view", 8.0))  // other user
    val out = Events.sessionizeNative(df, 30)
      .orderBy("user_id", "session_start")
      .select("user_id", "session_start", "session_end", "n_events", "total_value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getTimestamp(2).toString,
        r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      (7L, "2024-01-01 10:00:00.0", "2024-01-01 11:00:00.0", 2L, 3.0),
      (7L, "2024-01-01 11:00:01.0", "2024-01-01 11:30:01.0", 1L, 4.0),
      (8L, "2024-01-01 12:00:00.0", "2024-01-01 12:30:00.0", 1L, 8.0)))
  }

  test("commonSequences counts per-user consecutive paths, never across users") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 10:01:00", 1L, "click", 0.0),
      (3L, "2024-01-01 10:02:00", 1L, "purchase", 0.0),
      (4L, "2024-01-01 10:03:00", 1L, "view", 0.0),
      // user 2: view → click only; their click must not chain into user 1
      (5L, "2024-01-01 10:00:00", 2L, "view", 0.0),
      (6L, "2024-01-01 10:01:00", 2L, "click", 0.0))
    val out = Events.commonSequences(df, k = 2, topN = 10)
      .select("sequence", "cnt").as[(String, Long)].collect().toMap
    assert(out == Map(
      "view -> click" -> 2L, "click -> purchase" -> 1L, "purchase -> view" -> 1L))
    val three = Events.commonSequences(df, k = 3, topN = 10)
      .select("sequence", "cnt").as[(String, Long)].collect().toMap
    assert(three == Map(
      "view -> click -> purchase" -> 1L, "click -> purchase -> view" -> 1L))
  }

  test("rangeJoin: inclusive endpoints, cross-bucket intervals, per-key isolation") {
    val points = Seq(
      (1L, "2024-01-01 10:00:00", 7L), // == interval start (inclusive)
      (2L, "2024-01-01 11:30:00", 7L), // interior, 2nd bucket of the interval
      (3L, "2024-01-01 12:00:00", 7L), // == interval end (inclusive)
      (4L, "2024-01-01 12:00:01", 7L), // 1s past end — out
      (5L, "2024-01-01 11:00:00", 8L)) // inside the window but wrong key
      .toDF("event_id", "ts0", "user_id")
      .select($"event_id", to_timestamp($"ts0").as("ts"), $"user_id")
    val intervals = Seq(
      (100L, "2024-01-01 10:00:00", "2024-01-01 12:00:00", 7L),
      (101L, "2024-01-01 11:20:00", "2024-01-01 11:40:00", 7L), // overlaps pt 2
      (102L, "2024-01-01 09:00:00", "2024-01-01 08:00:00", 7L)) // end < start: dropped
      .toDF("iid", "s0", "e0", "user_id")
      .select($"iid", to_timestamp($"s0").as("w_start"), to_timestamp($"e0").as("w_end"), $"user_id")
    val out = Events.rangeJoin(points, intervals, "ts", "w_start", "w_end",
        intervalPayload = Seq("iid"), keys = Seq("user_id"), bucketSeconds = 3600L)
      .select("event_id", "iid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 100L), (2L, 100L), (3L, 100L), (2L, 101L)))
  }

  test("rangeJoin: keyless join and the bucket fan-out guard") {
    val points = Seq((1L, "2024-01-01 10:30:00"))
      .toDF("event_id", "ts0").select($"event_id", to_timestamp($"ts0").as("ts"))
    val intervals = Seq((9L, "2024-01-01 10:00:00", "2024-01-01 11:00:00"))
      .toDF("iid", "s0", "e0")
      .select($"iid", to_timestamp($"s0").as("w_start"), to_timestamp($"e0").as("w_end"))
    val ok = Events.rangeJoin(points, intervals, "ts", "w_start", "w_end",
      intervalPayload = Seq("iid"), bucketSeconds = 3600L)
    assert(ok.select("iid").as[Long].collect().toSeq == Seq(9L))
    // a 1-hour interval spans > 2 one-second buckets → guarded explode fails loudly
    val err = intercept[Exception] {
      Events.rangeJoin(points, intervals, "ts", "w_start", "w_end",
        intervalPayload = Seq("iid"), bucketSeconds = 1L, maxFanout = 2)
        .collect()
    }
    assert(err.getMessage.contains("rangeJoin") ||
      Option(err.getCause).exists(_.getMessage.contains("rangeJoin")))
  }

  test("streaming sessionWindowAgg: sessions finalize once the watermark passes") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long, Double)]
    val stream = ms.toDF().toDF("ts", "user_id", "value")
    val q = EventStream.sessionWindowAgg(stream, "30 minutes", "1 hour")
      .writeStream.format("memory").queryName("ev_sessions_out").outputMode("append").start()
    try {
      ms.addData((ts("2024-01-01 10:00:00"), 7L, 1.0), (ts("2024-01-01 10:10:00"), 7L, 2.0))
      q.processAllAvailable()
      // watermark far past session end (10:40) + delay → session emits
      ms.addData((ts("2024-01-01 13:00:00"), 7L, 4.0))
      q.processAllAvailable()
      ms.addData((ts("2024-01-01 15:00:00"), 7L, 8.0))
      q.processAllAvailable()
      val rows = spark.table("ev_sessions_out").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getTimestamp(2).toString,
          r.getLong(3), r.getDouble(4)))
      assert(rows.contains((7L, "2024-01-01 10:00:00.0", "2024-01-01 10:40:00.0", 2L, 3.0)))
      // the 15:00 session cannot be final yet
      assert(!rows.exists(_._2.startsWith("2024-01-01 15:")))
    } finally q.stop()
  }

  test("streaming intervalJoin: purchases pair with prior-hour views of the same user") {
    implicit val ctx = spark.sqlContext
    val purchases = MemoryStream[(Timestamp, Long, Long)]
    val views = MemoryStream[(Timestamp, Long, Long)]
    val joined = EventStream.intervalJoin(
      purchases.toDF().toDF("ts", "user_id", "event_id"),
      views.toDF().toDF("ts", "user_id", "event_id"),
      "user_id", before = "1 hour", after = "0 seconds")
    val q = joined
      .select("event_id", "r_event_id")
      .writeStream.format("memory").queryName("ev_ij_out").outputMode("append").start()
    try {
      views.addData(
        (ts("2024-01-01 09:30:00"), 7L, 1L),  // 30 min before the purchase → match
        (ts("2024-01-01 08:00:00"), 7L, 2L),  // 2h before → outside the window
        (ts("2024-01-01 09:45:00"), 8L, 3L))  // right time, wrong user
      purchases.addData((ts("2024-01-01 10:00:00"), 7L, 100L))
      q.processAllAvailable()
      val rows = spark.table("ev_ij_out").as[(Long, Long)].collect().toSet
      assert(rows == Set((100L, 1L)))
    } finally q.stop()
  }

  test("streaming windowedAgg: watermark finalizes past windows in append mode") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String, Double)]
    val stream = ms.toDF().toDF("ts", "event_type", "value")
    val q = EventStream.windowedAgg(stream, "1 hour", "1 hour")
      .writeStream.format("memory").queryName("ev_stream_out").outputMode("append").start()
    try {
      ms.addData((ts("2024-01-01 10:05:00"), "view", 1.0), (ts("2024-01-01 10:20:00"), "view", 2.0))
      q.processAllAvailable()
      ms.addData((ts("2024-01-01 13:00:00"), "view", 4.0)) // advances watermark to 12:00
      q.processAllAvailable()
      ms.addData((ts("2024-01-01 13:30:00"), "view", 8.0)) // triggers emission of hour-10 window
      q.processAllAvailable()
      val rows = spark.table("ev_stream_out")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(2), r.getDouble(3)))
      assert(rows.contains(("2024-01-01 10:00:00.0", 2L, 3.0)))
      // the 13:00 window is not final yet — append mode must not have emitted it
      assert(!rows.exists(_._1.startsWith("2024-01-01 13:")))
    } finally q.stop()
  }

  // 2024-01-01T00:00:00Z — an exact hour/day bucket boundary by construction
  // (timestamps built from epoch, so JVM default timezone is irrelevant)
  private val Base = 1704067200L

  private def evAt(key: String, hour: Int, n: Int): Seq[(String, Timestamp)] =
    (0 until n).map(i => key -> new Timestamp((Base + hour * 3600L + i % 60) * 1000))

  test("bucketCounts: dense zero-filled series per key, span-bounded") {
    // key a: events in hours 0 and 3 → 4 dense buckets incl. empty 1, 2
    val df = (evAt("a", 0, 2) ++ evAt("a", 3, 1) ++ evAt("b", 5, 4)).toDF("k", "ts")
    val got = Events.bucketCounts(df, "k", "ts", 3600L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(got == Seq(
      ("a", Base, 2L), ("a", Base + 3600, 0L), ("a", Base + 7200, 0L),
      ("a", Base + 10800, 1L), ("b", Base + 5 * 3600, 4L)).sorted)
    // the span guard fails loud instead of exploding an unbounded series
    val wild = (evAt("c", 0, 1) :+
      ("c" -> new Timestamp((Base + 220898000L) * 1000))).toDF("k", "ts")
    intercept[Exception] {
      Events.bucketCounts(wild, "k", "ts", 3600L, maxBucketsPerKey = 1000L).collect()
    }
  }

  test("rateSpikes: integer cross-multiplied trailing comparison, zero-filled trail counts") {
    // quiet days then a burst: day counts 1,1,0,0,0,0,12 → trailing-6 sum
    // is 2 ONLY because the dense series zero-fills days 2-5; 12·6 > 3·2
    // → spike. A steady key at 6,6 must not fire (6·1 > 3·6 is false).
    val day = 86400L
    def at(d: Int, n: Int) = (0 until n).map(i =>
      "u" -> new Timestamp((Base + d * day + i) * 1000))
    val df = (at(0, 1) ++ at(1, 1) ++ at(6, 12) ++
      (0 until 6).map(i => "v" -> new Timestamp((Base + i) * 1000)) ++
      (0 until 6).map(i => "v" -> new Timestamp((Base + day + i) * 1000))).toDF("k", "ts")
    val got = Events.rateSpikes(df, "k", "ts", day, trailing = 6, factor = 3L, minCount = 5L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(("u", Base + 6 * day, 12L, 6L, 2L)), got.mkString(", "))
  }

  test("countAnomalies: exact integer z-test against the key's own history") {
    // eleven quiet hours of 2 plus one hour of 40: a lone outlier among
    // n−1 constants has z = √(n−1) — n=12 gives z=√11 ≈ 3.32 > 3, strictly
    // flagged, while n=10 would sit EXACTLY on the k=3 boundary (strict
    // inequality: not anomalous). The quiet hours have z < 1.
    val df = ((0 until 11).flatMap(h => evAt("a", h, 2)) ++ evAt("a", 11, 40)).toDF("k", "ts")
    val got = Events.countAnomalies(df, "k", "ts", 3600L, k = 3L)
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(got.toSeq == Seq(("a", 40L)), got.mkString(", "))
    // the exact-boundary case: nine 2s and one outlier → z = 3 exactly,
    // strict comparison keeps it OUT (bit-exact integer equality, no ulps)
    val boundary = ((0 until 9).flatMap(h => evAt("b", h, 2)) ++ evAt("b", 9, 40)).toDF("k", "ts")
    assert(Events.countAnomalies(boundary, "k", "ts", 3600L, k = 3L).count() == 0)
    // uniform series: nothing is anomalous (dev = 0 for every bucket)
    val flat = (0 until 8).flatMap(h => evAt("c", h, 3)).toDF("k", "ts")
    assert(Events.countAnomalies(flat, "k", "ts", 3600L, k = 3L).count() == 0)
  }
}
