package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-stream analytics over `(event_id, ts, user_id, event_type, value,
 * props)` rows — the batch forms of the windowed/stateful computations a
 * telemetry pipeline needs. Streaming variants live in
 * [[graft.streaming.EventStream]].
 *
 * All time arithmetic is done in epoch microseconds (both Spark and
 * engine-portable SQL truncate parquet ns-timestamps to µs), and every
 * ordering includes `event_id` so ties on `ts` are total.
 */
object Events {

  /**
   * Tumbling or sliding (hopping) event-time windows: per (window,
   * event_type) counts and money totals. With `slide < duration` each
   * event lands in `duration/slide` overlapping windows (Spark's `window`
   * expands them before the aggregate); either way it is one hash
   * aggregate on the derived window start — one shuffle, partial
   * aggregation map-side, the fan-out bounded by the overlap factor.
   */
  def windowedAgg(
      events: DataFrame, duration: String = "1 hour",
      slide: Option[String] = None): DataFrame =
    events
      .groupBy(
        window(col("ts"), duration, slide.getOrElse(duration))
          .getField("start").as("window_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(FinOps.money(col("value"))).cast("double").as("total"))

  /**
   * Point-in-time (as-of) join: for every left row, the single latest right
   * row of the same key with `right.time <= left.time` — the join that makes
   * feature lookups leakage-free in a training pipeline.
   *
   * Spark has no ASOF join operator; the naive `left.ts >= right.ts`
   * inequality join explodes to all-pairs-per-key. This implementation is the
   * scalable union trick: tag both sides, sort each key's rows by
   * `(time, side, tiebreak)` in ONE partitioned window, and carry the last
   * non-null right payload forward — one shuffle by key, linear in
   * |left| + |right|, no custom operator needed.
   *
   * `rightPayload` names the right columns to surface (nulls when nothing
   * precedes); `rightTiebreak` must make right rows totally ordered within
   * (key, time) ties or the carried row is not deterministic.
   */
  def asOfJoin(
      left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
      rightPayload: Seq[String], rightTiebreak: Seq[String] = Nil): DataFrame = {
    val carried = asOfCarried(left, right, keyCol, timeCol, rightPayload, rightTiebreak)
    carried.select(
      left.columns.toIndexedSeq.map(c => col(s"_lpay.$c").as(c)) ++
        rightPayload.map(c => col(s"_asof.$c").as(c)): _*)
  }

  /**
   * [[asOfJoin]] with a STALENESS bound — the feature-store TTL semantic:
   * the carried right row only surfaces when it is at most
   * `withinSeconds` old at the left row's time; older matches null out
   * exactly like no-match (a model must not train on a feature that
   * would have been expired at serving time). The comparison is exact
   * integer MICROseconds (`unix_micros`) — no truncate-then-subtract
   * second rounding, so boundary rows replay identically in the oracle.
   * Same one-shuffle union-and-carry plan as the unbounded form.
   */
  def asOfJoinWithin(
      left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
      withinSeconds: Long, rightPayload: Seq[String],
      rightTiebreak: Seq[String] = Nil): DataFrame = {
    require(withinSeconds >= 0, s"withinSeconds must be >= 0, got $withinSeconds")
    val carried = asOfCarried(left, right, keyCol, timeCol, rightPayload, rightTiebreak)
    val fresh = col("_asof_ts").isNotNull &&
      unix_micros(col("_ts")) - unix_micros(col("_asof_ts")) <= withinSeconds * 1000000L
    carried.select(
      left.columns.toIndexedSeq.map(c => col(s"_lpay.$c").as(c)) ++
        rightPayload.map(c => when(fresh, col(s"_asof.$c")).otherwise(lit(null)).as(c)): _*)
  }

  /** Shared as-of core: union-tag both sides, one per-key window pass
    * carrying the latest right payload AND its timestamp; returns left
    * rows with `_lpay`, `_asof`, `_asof_ts`, `_ts` available. */
  private def asOfCarried(
      left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
      rightPayload: Seq[String], rightTiebreak: Seq[String]): DataFrame = {
    val rpay = struct(rightPayload.map(col): _*)
    val rpayType = right.select(rpay.as("_rpay")).schema("_rpay").dataType
    val lpay = struct(left.columns.toIndexedSeq.map(col): _*)
    val lpayType = left.select(lpay.as("_lpay")).schema("_lpay").dataType
    val rtie = rightTiebreak.map(c => col(c).as(s"_tie_$c"))
    val ltie = rightTiebreak.map(c => lit(null).cast(right.select(col(c)).schema.head.dataType).as(s"_tie_$c"))

    val r = right.select(
      (Seq(col(keyCol).as("_key"), col(timeCol).as("_ts"), lit(0).as("_side"),
        rpay.as("_rpay"), lit(null).cast(lpayType).as("_lpay")) ++ rtie): _*)
    val l = left.select(
      (Seq(col(keyCol).as("_key"), col(timeCol).as("_ts"), lit(1).as("_side"),
        lit(null).cast(rpayType).as("_rpay"), lpay.as("_lpay")) ++ ltie): _*)

    val order = Seq(col("_ts").asc, col("_side").asc) ++
      rightTiebreak.map(c => col(s"_tie_$c").asc_nulls_first)
    val w = Window.partitionBy("_key").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("_asof", last(col("_rpay"), ignoreNulls = true).over(w))
      .withColumn("_asof_ts",
        last(when(col("_side") === 0, col("_ts")), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
  }

  /**
   * Interval (range) join: every `points` row matched to each `intervals`
   * row of the same key whose `[start, end]` (inclusive both ends) contains
   * the point's time — "which maintenance windows / sessions / promotions
   * was this event inside?".
   *
   * Spark plans a raw `start <= t AND t <= end` predicate as a
   * nested-loop/cartesian per key — quadratic the moment keys are hot. This
   * is the standard bucketed formulation instead: time is quantized to
   * `bucketSeconds`-wide buckets, each interval is exploded to the buckets
   * it covers, and the join becomes a plain EQUI-join on `(keys, bucket)`
   * followed by the exact range filter. Each point owns exactly ONE bucket,
   * so no post-join dedup is needed; the only cost knob is interval fan-out
   * (`span / bucketSeconds + 1` rows per interval) — pick `bucketSeconds`
   * near the TYPICAL interval length so fan-out stays O(1) while buckets
   * stay selective. A span wider than `maxFanout` buckets fails loudly at
   * run time (inside the sequence bound, so the check cannot be pruned)
   * rather than silently materializing an unbounded explode.
   *
   * Intervals with `end < start` are dropped (empty by the inclusive
   * contract). `intervalPayload` names the interval columns to surface;
   * they must not collide with point column names.
   */
  def rangeJoin(
      points: DataFrame, intervals: DataFrame, pointTime: String,
      startCol: String, endCol: String, intervalPayload: Seq[String],
      keys: Seq[String] = Nil, bucketSeconds: Long = 3600L,
      maxFanout: Int = 10000): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    // fail loudly on name collisions instead of silently overwriting:
    // the op claims a _-prefixed working namespace on both sides, and
    // payload columns must not shadow point columns in the output
    val reserved = Seq("_pus", "_b", "_b0", "_b1", "_ius", "_ieus", "_ipay")
    val clash = (points.columns ++ intervals.columns).toSet.intersect(reserved.toSet)
    require(clash.isEmpty, s"rangeJoin reserves column names $reserved; input carries $clash")
    val dup = intervalPayload.toSet.intersect(points.columns.toSet)
    require(dup.isEmpty, s"intervalPayload collides with point columns: $dup")
    val wUs = bucketSeconds * 1000000L
    val ipay = struct(intervalPayload.map(col): _*)
    val guardedEnd = when(
      col("_b1") - col("_b0") < lit(maxFanout.toLong), col("_b1"))
      .otherwise(raise_error(concat(
        lit(s"rangeJoin: interval spans > $maxFanout buckets of ${bucketSeconds}s ("),
        (col("_b1") - col("_b0")).cast("string"),
        lit(") — widen bucketSeconds or split the interval"))).cast("long"))
    val i = intervals
      .where(col(endCol) >= col(startCol))
      .select(
        (keys.map(col) :+
          unix_micros(col(startCol)).as("_ius") :+
          unix_micros(col(endCol)).as("_ieus") :+
          ipay.as("_ipay")): _*)
      .withColumn("_b0", expr(s"_ius DIV ${wUs}L"))
      .withColumn("_b1", expr(s"_ieus DIV ${wUs}L"))
      .withColumn("_b", explode(sequence(col("_b0"), guardedEnd)))
      .drop("_b0", "_b1")
    val p = points
      .withColumn("_pus", unix_micros(col(pointTime)))
      .withColumn("_b", expr(s"_pus DIV ${wUs}L"))
    p.join(i, (keys :+ "_b").toIndexedSeq)
      .where(col("_pus") >= col("_ius") && col("_pus") <= col("_ieus"))
      .select(points.columns.toIndexedSeq.map(col) ++
        intervalPayload.map(c => col(s"_ipay.$c").as(c)): _*)
  }

  /**
   * Gap-based sessionization (batch): a new session starts when the gap to
   * the user's previous event exceeds `gapMinutes`. Classic two-window
   * pattern — `lag` to detect boundaries, running sum to number sessions —
   * both windows partitioned by user (an unpartitioned window would serialize
   * the cluster through one task).
   */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn(
        "is_new",
        when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_no", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_no")
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(FinOps.money(col("value"))).cast("double").as("total_value"))
  }

  /**
   * Gap-based sessionization via Spark's NATIVE `session_window` — the
   * built-in-operator counterpart of [[sessionize]] (which hand-rolls the
   * same thing with two windows). One hash aggregate with merging session
   * state, no analytic window functions at all; also the only formulation
   * that runs UNCHANGED as a watermarked streaming query
   * ([[graft.streaming.EventStream.sessionWindowAgg]]).
   *
   * Boundary semantics match [[sessionize]] exactly (a gap EQUAL to
   * `gapMinutes` still merges — verified empirically in EventOpsSpec); the
   * one output difference is `session_end` = `last event + gap` (the
   * window's close), not the last event's time.
   */
  def sessionizeNative(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    sessionWindowAgg(events, s"$gapMinutes minutes")

  /** The shared `session_window` aggregate behind [[sessionizeNative]] and
    * [[graft.streaming.EventStream.sessionWindowAgg]] — ONE definition of
    * the session output (columns, money discipline), applied to a batch
    * frame or a watermarked stream alike. */
  private[graft] def sessionWindowAgg(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(FinOps.money(col("value"))).cast("double").as("total_value"))
      .select(
        col("user_id"),
        col("w.start").as("session_start"),
        col("w.end").as("session_end"),
        col("n_events"), col("total_value"))

  /**
   * Most common `k`-step event-type sequences: consecutive events per user
   * (time order, `event_id` tiebreak) form sliding length-`k` paths, counted
   * corpus-wide and top-`topN` returned — the "what do users actually do"
   * path-mining complement to the hypothesis-driven [[funnel]].
   *
   * One user-partitioned window (k-1 `lead`s share a single sort), one
   * partial-aggregated count, and a `TakeOrdered` top-k — never a global
   * sort of the path table.
   */
  def commonSequences(events: DataFrame, k: Int = 3, topN: Int = 20): DataFrame = {
    require(k >= 2, s"sequence length must be >= 2, got $k")
    require(topN > 0, s"topN must be positive, got $topN")
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val steps = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type").as("e0"))
    val withNext = (1 until k).foldLeft(steps) { (d, i) =>
      d.withColumn(s"e$i", lead(col("e0"), i).over(w))
    }
    withNext
      // e0 included: a null head would otherwise be silently skipped by
      // concat_ws, emitting a shortened (k-1)-step path
      .where((0 until k).map(i => col(s"e$i").isNotNull).reduce(_ && _))
      .select(concat_ws(" -> ", (0 until k).map(i => col(s"e$i")): _*).as("sequence"))
      .groupBy("sequence")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("sequence").asc)
      .limit(topN)
  }

  /**
   * Ordered conversion funnel: step k counts the users whose earliest
   * step-k event occurs STRICTLY AFTER their step-(k-1) completion time —
   * the classic product-analytics funnel, order-sensitive (a purchase
   * before the first click does not convert the click step). Returns one
   * row per step: `(step_no, step, users)`.
   *
   * One filtered-min aggregation per step (k is 3–5 in practice), each a
   * hash-partitioned aggregate joined back on user — no per-user event
   * sorting, no window over the whole stream, no explode. Completion
   * times accumulate as grouping keys (functionally dependent on
   * user_id), so each level is a plain shuffle-once aggregate.
   */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel requires at least one step")
    // each level is materialized (localCheckpoint): level i is referenced by
    // level i+1 AND its own count branch of the final union — without the
    // cut, union branch i re-executes levels 0..i (k² aggregate work)
    val levels = collection.mutable.ArrayBuffer[DataFrame](
      events.where(col("event_type") === steps.head)
        .groupBy("user_id").agg(min(col("ts")).as("t0"))
        .localCheckpoint())
    for (k <- 1 until steps.length) {
      val carried = (0 until k).map(i => col(s"t$i"))
      levels += events
        .where(col("event_type") === steps(k))
        .select(col("user_id"), col("ts"))
        .join(levels.last, "user_id")
        .where(col("ts") > col(s"t${k - 1}"))
        .groupBy((col("user_id") +: carried): _*)
        .agg(min(col("ts")).as(s"t$k"))
        .localCheckpoint()
    }
    levels.zipWithIndex.map { case (lvl, i) =>
      lvl.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("step_no"), lit(steps(i)).as("step"), col("users"))
    }.reduce(_.unionByName(_))
  }

  /**
   * Cohort retention: users grouped by the calendar `period` of their
   * FIRST activity (their cohort); for each `(cohort, offset)`, the number
   * of that cohort's users active `offset` periods later — the retention
   * matrix behind every growth dashboard. Periods are `date_trunc`
   * boundaries (engine-portable; weeks start Monday in both Spark and
   * standard SQL).
   *
   * Two hash aggregates (distinct user-periods, then per-user min) and one
   * key-partitioned join back — linear in events, never all-pairs.
   */
  /**
   * DENSE per-key bucket counts: for every key, one row per `bucketSeconds`
   * bucket between that key's first and last event — zero-filled, so
   * rate-over-time statistics ([[rateSpikes]], [[countAnomalies]]) see the
   * quiet buckets too (a sparse `groupBy` silently skips them, and "3× the
   * trailing average" is meaningless when the trailing zeros are missing).
   * Buckets are epoch-second longs (`floor(epoch/bs)·bs`) — pure integer
   * arithmetic, engine-portable to the bit.
   *
   * Shape at scale: one grouped count (map-side partial), a per-key
   * min/max aggregate, a `sequence` explode of the key's bucket range, and
   * one key+bucket join. The explode is bounded by `range/bucketSeconds`
   * per key (guarded by `maxBucketsPerKey` — fail loud rather than
   * generate an unbounded series from one misdated event).
   */
  def bucketCounts(
      events: DataFrame, keyCol: String, tsCol: String,
      bucketSeconds: Long = 3600L,
      maxBucketsPerKey: Long = 100000L): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    // bucket = sec − (sec mod bs): pure INTEGER arithmetic (a double
    // divide-then-floor is exact here too, but why reason about ulps)
    val sec = unix_timestamp(col(tsCol))
    val bkt = sec - pmod(sec, lit(bucketSeconds))
    // materialized: the (key, bucket)-sized count table feeds both the
    // span aggregate and the dense join — without the cut the events scan
    // runs twice (the retention discipline)
    val counted = events
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("key"), bkt.as("bucket"))
      .groupBy("key", "bucket").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val spans = counted.groupBy("key")
      .agg(min("bucket").as("_lo"), max("bucket").as("_hi"))
      // the guard rides the per-key row path — it fails on the executor
      // with the offending key visible, before any explode happens
      .where(when(
          (col("_hi") - col("_lo")) / lit(bucketSeconds) + 1 <= maxBucketsPerKey,
          lit(true))
        .otherwise(raise_error(concat(
          lit("bucketCounts: key "), col("key").cast("string"),
          lit(s" spans more than $maxBucketsPerKey buckets")))))
    spans
      .select(col("key"),
        explode(sequence(col("_lo"), col("_hi"), lit(bucketSeconds))).as("bucket"))
      .join(counted, Seq("key", "bucket"), "left")
      .na.fill(0L, Seq("cnt"))
  }

  /**
   * Trailing-window rate-spike detection over the DENSE bucket series:
   * flag `(key, bucket)` where the bucket's count exceeds `factor`× the
   * trailing-`trailing`-bucket average, with at least `minCount` events.
   * The comparison is the cross-multiplied integer form
   * `cnt · m > factor · s` (m = trailing buckets available, s = their
   * sum) — no float division anywhere, so the flag is bit-identical on
   * any engine. Zero-filled buckets make the trailing average honest
   * (a burst after silence IS a spike).
   *
   * One window pass over the dense series (partitioned by key, ordered by
   * bucket — the sort is per key, never global). Emits the flagged rows
   * with their evidence: `(key, bucket, cnt, trail_n, trail_sum)`.
   */
  def rateSpikes(
      events: DataFrame, keyCol: String, tsCol: String,
      bucketSeconds: Long = 3600L, trailing: Int = 6,
      factor: Long = 3L, minCount: Long = 5L): DataFrame = {
    require(trailing >= 1, s"trailing must be >= 1, got $trailing")
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val w = Window.partitionBy("key").orderBy("bucket")
      .rowsBetween(-trailing, -1)
    bucketCounts(events, keyCol, tsCol, bucketSeconds)
      .withColumn("trail_n", count(lit(1)).over(w))
      .withColumn("trail_sum", sum("cnt").over(w))
      .where(col("trail_n") >= 1 &&
        col("cnt") >= minCount &&
        col("cnt") * col("trail_n") > lit(factor) * col("trail_sum"))
  }

  /**
   * Per-key count anomalies by a z-test over the key's OWN dense bucket
   * history, computed entirely in integers: with n buckets, S = Σcnt,
   * Q = Σcnt², bucket x is anomalous iff
   * `(n·x − S)² > k² · (n·Q − S²)` — the cross-multiplied form of
   * `|x − μ| > k·σ` (μ = S/n, σ² = (n·Q − S²)/n²), exact on any engine
   * because no division or square root ever happens. Overflow bound:
   * `n·max(cnt)` must stay below ~3·10⁹ (long math) — comfortably true for
   * per-key telemetry series; a series outside that regime should be
   * bucketed coarser first.
   *
   * Two aggregates over the dense series (per-key moments joined back) —
   * the corpus is scanned once, moments are one row per key. Emits
   * anomalous rows with their integer evidence:
   * `(key, bucket, cnt, n_buckets, sum_cnt, sumsq_cnt)`.
   */
  def countAnomalies(
      events: DataFrame, keyCol: String, tsCol: String,
      bucketSeconds: Long = 3600L, k: Long = 3L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // materialized: the dense series feeds both the moment aggregate and
    // the flagging join
    val dense = bucketCounts(events, keyCol, tsCol, bucketSeconds)
      .localCheckpoint()
    val moments = dense.groupBy("key").agg(
      count(lit(1)).as("n_buckets"),
      sum("cnt").as("sum_cnt"),
      sum(col("cnt") * col("cnt")).as("sumsq_cnt"))
    val dev = col("n_buckets") * col("cnt") - col("sum_cnt")
    dense.join(moments, "key")
      .where(dev * dev > lit(k * k) *
        (col("n_buckets") * col("sumsq_cnt") - col("sum_cnt") * col("sum_cnt")))
  }

  def retention(events: DataFrame, maxOffset: Int = 8): DataFrame = {
    // materialized: activity feeds both the cohort build and the join —
    // without the cut the events scan + distinct runs twice
    val activity = events
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("p"))
      .distinct()
      .localCheckpoint()
    val cohorts = activity.groupBy("user_id").agg(min(col("p")).as("cohort"))
    activity.join(cohorts, "user_id")
      .withColumn("offset", (datediff(col("p"), col("cohort")) / lit(7)).cast("int"))
      .where(col("offset") <= maxOffset)
      .groupBy("cohort", "offset")
      .agg(count_distinct(col("user_id")).as("users"))
  }
}
