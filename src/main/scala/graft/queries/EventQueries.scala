package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Events, Profile, Scale}

/** Driver-contract queries for the event-stream operators (batch forms of
  * the streaming computations — SURVEY §2.6 adjacency). */
object EventQueries {

  private type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Tumbling event-time windows
    "q_ev_window_hour" -> ((s, dir) =>
      Events.windowedAgg(Tpch.read(s, dir, "events"), "1 hour")
        .orderBy("window_start", "event_type")),

    // Gap-based sessionization (30-minute inactivity gap)
    "q_ev_sessions" -> ((s, dir) =>
      Events.sessionize(Tpch.read(s, dir, "events"), 30)
        .orderBy("user_id", "session_no")),

    // Native session_window sessionization (same gap boundary as
    // q_ev_sessions; end = last event + gap)
    "q_ev_sessions_native" -> ((s, dir) =>
      Events.sessionizeNative(Tpch.read(s, dir, "events"), 30)
        .orderBy("user_id", "session_start")),

    // Sliding (hopping) windows: 1-hour windows every 30 minutes — each
    // event lands in exactly two overlapping windows
    "q_ev_window_sliding" -> ((s, dir) =>
      Events.windowedAgg(Tpch.read(s, dir, "events"), "1 hour", Some("30 minutes"))
        .orderBy("window_start", "event_type")),

    // Ordered conversion funnel: view → click → purchase, strictly-after
    // step ordering (a purchase before the first click does not convert)
    "q_ev_funnel" -> ((s, dir) =>
      Events.funnel(Tpch.read(s, dir, "events"), Seq("view", "click", "purchase"))
        .orderBy("step_no")),

    // Path mining: the 20 most common 3-step event-type sequences
    "q_ev_sequences" -> ((s, dir) =>
      Events.commonSequences(Tpch.read(s, dir, "events"), k = 3, topN = 20)),

    // Weekly cohort retention matrix (first-activity week × offset)
    "q_ev_retention" -> ((s, dir) =>
      Events.retention(Tpch.read(s, dir, "events"), maxOffset = 8)
        .orderBy("cohort", "offset")),

    // JSON property extraction + aggregation over the semi-structured column
    "q_ev_props_json" -> ((s, dir) =>
      Tpch.read(s, dir, "events")
        .select(
          col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("event_type")
        .agg(
          count(col("k")).as("n"),
          sum(col("k")).as("k_sum"),
          min(col("k")).as("k_min"),
          max(col("k")).as("k_max"))
        .orderBy("event_type")),

    // Exact interpolated percentiles per event type
    "q_ev_percentiles" -> ((s, dir) =>
      Tpch.read(s, dir, "events")
        .groupBy("event_type")
        .agg(
          percentile(col("value"), lit(0.5)).as("p50"),
          percentile(col("value"), lit(0.9)).as("p90"))
        .orderBy("event_type")),

    // Robust outlier detection: events whose value deviates from the
    // median by more than 3 MADs (median absolute deviations)
    "q_ev_mad_outliers" -> ((s, dir) =>
      graft.ops.Profile.madOutliers(Tpch.read(s, dir, "events"), "value", 3.0)
        .select("event_id", "value")
        .orderBy("event_id")),

    // Interval (range) join: each view matched to every same-user purchase
    // window [purchase_ts, purchase_ts + 2h] containing it — bucketed
    // equi-join, never an inequality nested loop
    "q_ev_range_join" -> ((s, dir) => {
      val ev = Tpch.read(s, dir, "events")
      val windows = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 2 HOURS")).as("w_end"))
      val views = ev.where(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      Events.rangeJoin(views, windows, "ts", "w_start", "w_end",
          intervalPayload = Seq("purchase_id"), keys = Seq("user_id"),
          bucketSeconds = 3600L)
        .orderBy("purchase_id", "event_id")
    }),

    // Point-in-time join: each purchase matched to the user's latest prior view
    "q_ev_asof" -> ((s, dir) => {
      val ev = Tpch.read(s, dir, "events")
      val purchases = ev.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"),
          col("event_id").as("view_event"), col("value").as("view_value"),
          col("ts").as("view_ts"))
      Events.asOfJoin(purchases, views, "user_id", "ts",
          rightPayload = Seq("view_event", "view_value", "view_ts"),
          rightTiebreak = Seq("view_event"))
        .orderBy("event_id")
    }),

    // SCD Type-2 dimension merge: pre-closed history untouched, changed
    // keys closed + re-versioned, no-op updates suppressed, new keys
    // inserted live — all four regimes in one merge, fully replayed
    "q_scale_scd2" -> ((s, dir) => {
      val cust = Tpch.read(s, dir, "customer")
        .select("c_custkey", "c_mktsegment", "c_nationkey")
      val hist0 = cust.select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"),
        lit("2024-01-01").as("valid_from"),
        lit(null: String).cast("string").as("valid_to"))
      val oldClosed = cust.where(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"), lit("OLDSEG").as("c_mktsegment"), col("c_nationkey"),
          lit("2023-01-01").as("valid_from"), lit("2024-01-01").as("valid_to"))
      val current = oldClosed.unionByName(hist0)
      val updates = cust.where(col("c_custkey") % 7 === 0)
          .select(col("c_custkey"),
            concat(col("c_mktsegment"), lit("_V2")).as("c_mktsegment"), col("c_nationkey"))
        .unionByName(cust.where(col("c_custkey") % 7 === 1))  // no-op
        .unionByName(cust.where(col("c_custkey") % 13 === 0)  // brand new keys
          .select((col("c_custkey") + 1000000L).as("c_custkey"),
            col("c_mktsegment"), col("c_nationkey")))
      Scale.scd2Merge(current, updates, Seq("c_custkey"), "2024-06-01")
        .orderBy("c_custkey", "valid_from")
    }),

    // Join-strategy advisor over three regimes: a small dimension
    // (broadcast), a uniform key (plain shuffle at a forced-low broadcast
    // cutoff), and a planted 50%-hot key (salted, factor capped). Exact
    // per-side stats + the CMS join-size estimate; every number and the
    // recommendation string replay bit-exact in the oracle
    "q_scale_advisor" -> ((s, dir) => {
      val orders = Tpch.read(s, dir, "orders")
      val cust = Tpch.read(s, dir, "customer")
      val ev = Tpch.read(s, dir, "events")
      val users = ev.select("user_id").distinct()
      val skewed = ev.select(
        when(col("event_id") % 2 === 0, lit("hot"))
          .otherwise(col("user_id").cast("string")).as("skey"))
      val skeys = skewed.select("skey").distinct()
      Scale.joinAdvisor(orders, "o_custkey", cust, "c_custkey")
        .withColumn("scenario", lit("a_dim"))
        .unionByName(
          Scale.joinAdvisor(ev, "user_id", users, "user_id", broadcastRows = 100)
            .withColumn("scenario", lit("b_uniform")))
        .unionByName(
          Scale.joinAdvisor(skewed, "skey", skeys, "skey", broadcastRows = 100)
            .withColumn("scenario", lit("c_skewed")))
        .orderBy("scenario")
    }),

    // Referential-integrity audit with PLANTED orphans (parent thinned to
    // custkeys not divisible by 10): exact orphan row/key counts
    "q_val_ref_integrity" -> ((s, dir) =>
      graft.ops.Validate.refIntegrity(
        Tpch.read(s, dir, "orders"), "o_custkey",
        Tpch.read(s, dir, "customer").where(col("c_custkey") % 10 =!= 0), "c_custkey")),

    // One-pass constraint report: four contracts, one aggregate, exact
    // violation counts (an unevaluable predicate counts as violated)
    "q_val_constraints" -> ((s, dir) =>
      graft.ops.Validate.constraintReport(Tpch.read(s, dir, "events"), Seq(
          "value_positive" -> (col("value") > 0),
          "value_le_100" -> (col("value") <= 100),
          "props_not_null" -> col("props").isNotNull,
          "user_positive" -> (col("user_id") > 0)))
        .orderBy("constraint")),

    // Winsorization to the exact interpolated [p05, p95] range
    "q_val_winsorize" -> ((s, dir) =>
      graft.ops.Validate.winsorize(
          Tpch.read(s, dir, "events").select("event_id", "value"),
          "value", 0.05, 0.95)
        .orderBy("event_id")),

    // Group-median imputation: values nulled on a deterministic stripe
    // (event_id % 13 = 0), refilled with their event type's exact median
    "q_val_impute" -> ((s, dir) =>
      graft.ops.Validate.imputeByGroupMedian(
          Tpch.read(s, dir, "events")
            .select(col("event_id"), col("event_type"),
              when(col("event_id") % 13 === 0, lit(null)).otherwise(col("value")).as("value")),
          "value", "event_type")
        .select("event_id", "event_type", "value", "value_f")
        .orderBy("event_id")),

    // DDSketch-style log-bucket quantiles (alpha=1% relative VALUE error,
    // merge-by-addition histogram): bucket math and midpoint estimates
    // replay in the oracle
    "q_profile_ddsketch" -> ((s, dir) => {
      val h = Profile.ddHistogram(Tpch.read(s, dir, "events"), "value", 0.01)
      Profile.ddQuantiles(h, 0.01, Seq(0.5, 0.9, 0.99)).orderBy("p")
    }),

    // Per-group DD quantiles: same alpha guarantee, cumulative walk
    // partitioned by event type — the memory-bounded grouped-quantile tier
    "q_profile_ddsketch_group" -> ((s, dir) => {
      val h = Profile.ddHistogramByGroup(
        Tpch.read(s, dir, "events"), "event_type", "value", 0.01)
      Profile.ddQuantilesByGroup(h, 0.01, Seq(0.5, 0.9)).orderBy("grp", "p")
    }),

    // Quantiles over a deterministic bottom-k hash sample (k=500): the
    // fixed-memory, shuffle-free alternative to full-column percentile —
    // sample membership and interpolation replay exactly in the oracle
    "q_profile_quantile_sample" -> ((s, dir) =>
      Profile.hashSampleQuantiles(Tpch.read(s, dir, "events"), "event_id", "value",
          k = 500, probs = Seq(0.25, 0.5, 0.75, 0.9))
        .orderBy("p")),

    // Calibration (reliability-diagram) report for ANY probability-scored
    // gate: a planted MIS-calibrated scorer (score = (id%101)/100, label
    // true iff (id%97)·10 < (id%101)·8 — integer compare, engine-exact)
    // bucketed into deciles; per bucket volume, positives, and the
    // 4-dp-quantized integer-summed mean score. n_pos/n vs mean_score per
    // row is the curve an operator reads before trusting a threshold.
    "q_profile_calibration" -> ((s, dir) => {
      val d = Tpch.read(s, dir, "documents").select(
        col("doc_id"),
        ((col("doc_id") % 101) / lit(100.0)).as("score"),
        ((col("doc_id") % 97) * 10 < (col("doc_id") % 101) * 8).as("label"))
      Profile.calibrationReport(d, "score", "label", bins = 10)
        .orderBy("bucket")
    }),

    // Trailing-window rate-spike detection over the DENSE per-user daily
    // series: cross-multiplied integer comparison (cnt·m > 3·trail_sum),
    // zero-filled quiet days included — bit-exact on any engine
    "q_ev_rate_spikes" -> ((s, dir) =>
      Events.rateSpikes(Tpch.read(s, dir, "events"), "user_id", "ts",
          bucketSeconds = 86400L, trailing = 6, factor = 3L, minCount = 5L)
        .orderBy("key", "bucket")),

    // Integer z-test anomalies over each type's dense hourly history:
    // (n·x − S)² > 9·(n·Q − S²) — no division, no sqrt, no floats
    "q_ev_count_anomalies" -> ((s, dir) =>
      Events.countAnomalies(Tpch.read(s, dir, "events"), "event_type", "ts",
          bucketSeconds = 3600L, k = 3L)
        .orderBy("key", "bucket")),

    // TTL-bounded as-of join: the carried prior view only counts when at
    // most 1h old at purchase time (exact integer microsecond staleness)
    "q_ev_asof_ttl" -> ((s, dir) => {
      val ev = Tpch.read(s, dir, "events")
      val purchases = ev.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"),
          col("event_id").as("view_event"), col("ts").as("view_ts"))
      Events.asOfJoinWithin(purchases, views, "user_id", "ts",
          withinSeconds = 3600L,
          rightPayload = Seq("view_event", "view_ts"),
          rightTiebreak = Seq("view_event"))
        .orderBy("event_id")
    }),

    // Salted skew join (Scale.saltedJoin): events joined back to a
    // per-type aggregate dim — the classic "join the aggregate back under
    // a hot key" shape where one event_type dominates and AQE can't split
    // the skew because it sits in the aggregated stage's input. Salting is
    // a partitioning trick, not a semantics change, so the oracle is the
    // plain unsalted SQL join. Aggregates are count/max (exact integers) —
    // no float-summation-order hazards in the hash compare.
    "q_scale_salted_join" -> ((s, dir) => {
      val ev = Tpch.read(s, dir, "events")
      val dim = ev.groupBy("event_type")
        .agg(count(lit(1)).as("n_type"), max(col("event_id")).as("max_event"))
      Scale.saltedJoin(ev, dim, "event_type", "event_id", saltFactor = 8)
        .select("event_id", "event_type", "n_type", "max_event")
        .orderBy("event_id")
    }),

    // Native Misra-Gries heavy hitters (freq_items TypedImperativeAggregate):
    // k=16 over a bounded event-type domain → the sketch is provably exact
    // (no decrement can ever fire with distinct <= k), so the plain
    // group-count oracle must match bit-for-bit; the k < domain
    // approximation regime (undercount <= n/(k+1), guaranteed presence of
    // heavy items) is law-tested in FreqSketchSpec
    "q_profile_heavyhitters" -> ((s, dir) => {
      graft.GraftExtensions.register(s)
      Tpch.read(s, dir, "events")
        .agg(call_function("freq_items", col("event_type"), lit(16)).as("hh"))
        .select(explode(col("hh")).as("h"))
        .select(col("h.item").as("item"), col("h.count").as("cnt"))
        .orderBy(desc("cnt"), asc("item"))
    }),

    // Key-occupancy skew profile: the pre-flight diagnostic for the Scale
    // salting/bucketing decisions (one row, exact percentiles over per-key
    // counts)
    "q_profile_skew" -> ((s, dir) =>
      Profile.keySkew(Tpch.read(s, dir, "events"), "user_id")),

    // Count-Min point-frequency estimates (cms_sketch aggregate): the
    // sketch's counter matrix is a pure function of the input MULTISET
    // (merge = elementwise addition), so the DuckDB oracle replays the
    // d=4 × w=32 sketch bit-for-bit — estimates INCLUDING collision
    // overcounts must match exactly, not just approximately
    "q_profile_cms" -> ((s, dir) => {
      graft.GraftExtensions.register(s)
      val ev = Tpch.read(s, dir, "events")
      val keys = ev.where(col("event_type").isNotNull)
        .select("event_type").distinct()
      Profile.cmsEstimates(ev, "event_type", keys, d = 4, w = 32)
        .orderBy("item")
    }),

    // Join-size estimation from two Count-Min sketches (AMS inner product,
    // min over rows) next to the exact per-key-count answer — the
    // pre-shuffle broadcast/salt decision input. Both numbers are pure
    // functions of the input multisets, so the oracle replays the d=4×w=64
    // matrices and the min-of-inner-products bit-for-bit, collisions
    // included
    "q_profile_joinsize" -> ((s, dir) => {
      val orders = Tpch.read(s, dir, "orders")
      val cust = Tpch.read(s, dir, "customer")
      Profile.cmsJoinSize(orders, "o_custkey", cust, "c_custkey", d = 4, w = 64)
        .crossJoin(Profile.joinSizeExact(orders, "o_custkey", cust, "c_custkey"))
    }),

    // Distribution drift between two slices of the stream (even vs odd
    // event ids): per-key PSI and Jensen-Shannon contributions over the
    // event-type distribution — count arithmetic + ln, rounded at the
    // query layer only
    "q_profile_drift" -> ((s, dir) => {
      val ev = Tpch.read(s, dir, "events")
      Profile.driftByKey(
          ev.where(col("event_id") % 2 === 0),
          ev.where(col("event_id") % 2 === 1), "event_type")
        .select(col("key"), col("ref_cnt"), col("cur_cnt"),
          round(col("psi"), 6).as("psi"), round(col("jsd"), 6).as("jsd"))
        .orderBy("key")
    }),

    // Numeric drift: the value column DD-log-bucketed (the exact
    // ddsketch bucket math) then scored through the SAME PSI/JSD
    // arithmetic — binned continuous PSI, bucket assignment + bucket
    // midpoint + both divergences all replayed bit-exact in the oracle
    "q_profile_drift_numeric" -> ((s, dir) => {
      val ev = Tpch.read(s, dir, "events")
      Profile.driftNumericByBucket(
          ev.where(col("event_id") % 2 === 0),
          ev.where(col("event_id") % 2 === 1), "value", alpha = 0.05)
        .select(col("bucket"), col("bucket_mid"), col("ref_cnt"), col("cur_cnt"),
          round(col("psi"), 6).as("psi"), round(col("jsd"), 6).as("jsd"))
        .orderBy("bucket")
    }),

    // Skew-aware two-phase nesting (Scale.saltedCollectList): per-type
    // event-id lists built under a salt so no single task holds more than
    // ~1/8 of a hot key's collect_list state; the flattened list is sorted
    // and serialized to a CSV string so the driver's row comparator (which
    // cannot sort raw array cells) can hash it against the oracle
    "q_scale_salted_nest" -> ((s, dir) => {
      val ev = Tpch.read(s, dir, "events")
      Scale.saltedCollectList(ev, "event_type", "event_id",
          col("event_id"), saltFactor = 8)
        .select(col("event_type"),
          array_join(array_sort(col("items")), ",").as("items"))
        .orderBy("event_type")
    })
  )

  val oracleSql: Map[String, String] = Map(
    // every event sits in exactly two hop windows: its 30-min grid start
    // and that minus 30 min (epoch-aligned grid = Spark's window alignment)
    "q_ev_window_sliding" ->
      """WITH g AS (SELECT epoch_us(ts) - (epoch_us(ts) % 1800000000) AS g0, event_type, value
        |           FROM events),
        |w AS (SELECT make_timestamp(x) AS window_start, event_type, value
        |      FROM (SELECT unnest([g0, g0 - 1800000000]) AS x, event_type, value FROM g))
        |SELECT window_start, event_type, count(*) AS cnt,
        |       CAST(SUM(CAST(round(value, 2) AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM w GROUP BY window_start, event_type
        |ORDER BY window_start, event_type""".stripMargin,

    "q_ev_funnel" ->
      """WITH s0 AS (SELECT user_id, min(ts) AS t0 FROM events
        |            WHERE event_type = 'view' GROUP BY user_id),
        |s1 AS (SELECT e.user_id, min(e.ts) AS t1 FROM events e
        |       JOIN s0 ON s0.user_id = e.user_id
        |       WHERE e.event_type = 'click' AND e.ts > s0.t0 GROUP BY e.user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |       JOIN s1 ON s1.user_id = e.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > s1.t1 GROUP BY e.user_id)
        |SELECT 1 AS step_no, 'view' AS step, count(*) AS users FROM s0
        |UNION ALL SELECT 2, 'click', count(*) FROM s1
        |UNION ALL SELECT 3, 'purchase', count(*) FROM s2
        |ORDER BY step_no""".stripMargin,

    "q_ev_sequences" ->
      """WITH o AS (SELECT event_type AS e0,
        |             lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e1,
        |             lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2
        |           FROM events)
        |SELECT e0 || ' -> ' || e1 || ' -> ' || e2 AS sequence, count(*) AS cnt
        |FROM o WHERE e0 IS NOT NULL AND e1 IS NOT NULL AND e2 IS NOT NULL
        |GROUP BY sequence ORDER BY cnt DESC, sequence ASC LIMIT 20""".stripMargin,

    "q_ev_retention" ->
      """WITH act AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS p
        |             FROM events),
        |coh AS (SELECT user_id, min(p) AS cohort FROM act GROUP BY user_id)
        |SELECT c.cohort, CAST(date_diff('day', c.cohort, a.p) // 7 AS INT) AS "offset",
        |       count(DISTINCT a.user_id) AS users
        |FROM act a JOIN coh c ON c.user_id = a.user_id
        |WHERE date_diff('day', c.cohort, a.p) // 7 <= 8
        |GROUP BY c.cohort, "offset"
        |ORDER BY c.cohort, "offset"""".stripMargin,

    "q_ev_window_hour" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS cnt,
        |  CAST(SUM(CAST(round(value, 2) AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY window_start, event_type
        |ORDER BY window_start, event_type""".stripMargin,

    "q_ev_sessions_native" ->
      """WITH o AS (SELECT user_id, event_id, ts, value,
        |             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |           FROM events),
        |s AS (SELECT *, CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
        |                     THEN 1 ELSE 0 END AS is_new
        |      FROM o),
        |n AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM s)
        |SELECT user_id,
        |  min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  count(*) AS n_events,
        |  CAST(SUM(CAST(round(value, 2) AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM n GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "q_ev_sessions" ->
      """WITH o AS (SELECT user_id, event_id, ts, value,
        |             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |           FROM events),
        |s AS (SELECT *, CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
        |                     THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS is_new
        |      FROM o),
        |n AS (SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
        |      FROM s)
        |SELECT user_id, session_no,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events,
        |  CAST(SUM(CAST(round(value, 2) AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM n GROUP BY user_id, session_no
        |ORDER BY user_id, session_no""".stripMargin,

    "q_ev_props_json" ->
      """SELECT event_type,
        |  count(k) AS n, CAST(SUM(k) AS BIGINT) AS k_sum, min(k) AS k_min, max(k) AS k_max
        |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_ev_percentiles" ->
      """SELECT event_type, quantile_cont(value, 0.5) AS p50, quantile_cont(value, 0.9) AS p90
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_ev_mad_outliers" ->
      """WITH m AS (SELECT quantile_cont(CAST(value AS DOUBLE), 0.5) AS med
        |           FROM events WHERE value IS NOT NULL),
        |d AS (SELECT quantile_cont(abs(CAST(value AS DOUBLE) - med), 0.5) AS mad
        |      FROM events, m WHERE value IS NOT NULL)
        |SELECT event_id, value
        |FROM events, m, d
        |WHERE value IS NOT NULL
        |  AND abs(CAST(value AS DOUBLE) - med) > 3.0 * mad
        |ORDER BY event_id""".stripMargin,

    "q_ev_range_join" ->
      """WITH w AS (SELECT user_id, event_id AS purchase_id, ts AS w_start,
        |                  ts + INTERVAL 2 HOUR AS w_end
        |           FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'view')
        |SELECT v.event_id, v.user_id, v.ts, v.value, w.purchase_id
        |FROM v JOIN w ON w.user_id = v.user_id
        |            AND v.ts >= w.w_start AND v.ts <= w.w_end
        |ORDER BY w.purchase_id, v.event_id""".stripMargin,

    "q_ev_asof" ->
      """WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, ts, event_id AS view_event, value AS view_value, ts AS view_ts
        |      FROM events WHERE event_type = 'view')
        |SELECT p.event_id, p.user_id, p.ts, p.value, v.view_event, v.view_value, v.view_ts
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY p.event_id""".stripMargin,

    "q_ev_asof_ttl" ->
      """WITH p AS (SELECT event_id, user_id, ts, value FROM events
        |           WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, ts, event_id AS view_event, ts AS view_ts
        |      FROM events WHERE event_type = 'view')
        |SELECT p.event_id, p.user_id, p.ts, p.value,
        |  CASE WHEN v.ts IS NOT NULL
        |            AND epoch_us(p.ts) - epoch_us(v.ts) <= 3600000000
        |       THEN v.view_event END AS view_event,
        |  CASE WHEN v.ts IS NOT NULL
        |            AND epoch_us(p.ts) - epoch_us(v.ts) <= 3600000000
        |       THEN v.view_ts END AS view_ts
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY p.event_id""".stripMargin,

    // the unsalted join — salting must be invisible in the result
    "q_scale_salted_join" ->
      """WITH dim AS (SELECT event_type, count(*) AS n_type,
        |                    max(event_id) AS max_event
        |             FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type, dim.n_type, dim.max_event
        |FROM events e JOIN dim USING (event_type)
        |ORDER BY e.event_id""".stripMargin,

    "q_scale_salted_nest" ->
      """SELECT event_type,
        |       array_to_string(list_sort(list(event_id)), ',') AS items
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // full sketch replay: per-row buckets from the shared md5-affine hash
    // family, per-cell totals, then min across rows — the exact CMS
    // semantics including collisions
    "q_profile_cms" ->
      """WITH ev AS (SELECT event_type FROM events WHERE event_type IS NOT NULL),
        |h AS (SELECT event_type,
        |             ('0x' || substr(md5(event_type), 1, 8))::BIGINT AS h32,
        |             count(*) AS cnt
        |      FROM ev GROUP BY event_type),
        |b AS (SELECT i, event_type, cnt,
        |             ((h32 * (2*i + 1) + (98765*i + 12345)) % 2147483647) % 32 AS bkt
        |      FROM h, range(4) t(i)),
        |cell AS (SELECT i, bkt, SUM(cnt) AS total FROM b GROUP BY i, bkt)
        |SELECT b.event_type AS item, CAST(MIN(cell.total) AS BIGINT) AS est
        |FROM b JOIN cell ON cell.i = b.i AND cell.bkt = b.bkt
        |GROUP BY b.event_type ORDER BY item""".stripMargin,

    // exact because distinct(event_type) <= k — see the query comment
    "q_profile_heavyhitters" ->
      """SELECT event_type AS item, count(*) AS cnt FROM events
        |WHERE event_type IS NOT NULL
        |GROUP BY event_type ORDER BY cnt DESC, item""".stripMargin,

    "q_profile_skew" ->
      """WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id)
        |SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS n_rows,
        |       max(cnt) AS max_cnt,
        |       quantile_cont(cnt, 0.5) AS p50_cnt,
        |       quantile_cont(cnt, 0.99) AS p99_cnt
        |FROM c""".stripMargin,

    "q_scale_scd2" ->
      """WITH c AS (SELECT c_custkey, c_mktsegment, c_nationkey FROM customer),
        |hist0 AS (SELECT c_custkey, c_mktsegment, c_nationkey,
        |            '2024-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to FROM c),
        |oldc AS (SELECT c_custkey, 'OLDSEG' AS c_mktsegment, c_nationkey,
        |           '2023-01-01' AS valid_from, '2024-01-01' AS valid_to
        |         FROM c WHERE c_custkey % 10 = 0),
        |cur AS (SELECT * FROM oldc UNION ALL SELECT * FROM hist0),
        |upd AS (SELECT c_custkey, c_mktsegment || '_V2' AS c_mktsegment, c_nationkey
        |        FROM c WHERE c_custkey % 7 = 0
        |        UNION ALL SELECT c_custkey, c_mktsegment, c_nationkey
        |        FROM c WHERE c_custkey % 7 = 1
        |        UNION ALL SELECT c_custkey + 1000000, c_mktsegment, c_nationkey
        |        FROM c WHERE c_custkey % 13 = 0),
        |live AS (SELECT * FROM cur WHERE valid_to IS NULL),
        |dead AS (SELECT * FROM cur WHERE valid_to IS NOT NULL),
        |j AS (SELECT l.c_custkey, l.c_mktsegment, l.c_nationkey, l.valid_from, l.valid_to,
        |             u.c_custkey AS uk, u.c_mktsegment AS useg, u.c_nationkey AS unat
        |      FROM live l FULL OUTER JOIN upd u ON l.c_custkey = u.c_custkey),
        |kept AS (SELECT c_custkey, c_mktsegment, c_nationkey, valid_from, valid_to FROM j
        |         WHERE c_custkey IS NOT NULL AND (uk IS NULL OR
        |           (c_mktsegment IS NOT DISTINCT FROM useg AND c_nationkey IS NOT DISTINCT FROM unat))),
        |closed AS (SELECT c_custkey, c_mktsegment, c_nationkey, valid_from,
        |             '2024-06-01' AS valid_to FROM j
        |           WHERE c_custkey IS NOT NULL AND uk IS NOT NULL AND NOT
        |             (c_mktsegment IS NOT DISTINCT FROM useg AND c_nationkey IS NOT DISTINCT FROM unat)),
        |fresh AS (SELECT uk AS c_custkey, useg AS c_mktsegment, unat AS c_nationkey,
        |            '2024-06-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to FROM j
        |          WHERE uk IS NOT NULL AND (c_custkey IS NULL OR NOT
        |            (c_mktsegment IS NOT DISTINCT FROM useg AND c_nationkey IS NOT DISTINCT FROM unat)))
        |SELECT * FROM dead UNION ALL SELECT * FROM kept
        |UNION ALL SELECT * FROM closed UNION ALL SELECT * FROM fresh
        |ORDER BY c_custkey, valid_from""".stripMargin,

    // per-scenario exact stats + d=2 x w=128 CMS inner-product replays +
    // the decision ladder with the operator's exact float-op order
    "q_scale_advisor" ->
      """WITH
        |la AS (SELECT CAST(o_custkey AS VARCHAR) AS k FROM orders WHERE o_custkey IS NOT NULL),
        |ra AS (SELECT CAST(c_custkey AS VARCHAR) AS k FROM customer WHERE c_custkey IS NOT NULL),
        |lb AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events WHERE user_id IS NOT NULL),
        |rb AS (SELECT DISTINCT k FROM lb),
        |lc AS (SELECT k FROM (SELECT CASE WHEN event_id % 2 = 0 THEN 'hot'
        |                      ELSE CAST(user_id AS VARCHAR) END AS k FROM events)
        |       WHERE k IS NOT NULL),
        |rc AS (SELECT DISTINCT k FROM lc),
        |ha_a AS (SELECT k, ('0x' || substr(md5(k), 1, 8))::BIGINT AS h32, count(*) AS cnt FROM la GROUP BY k),
        |hb_a AS (SELECT k, ('0x' || substr(md5(k), 1, 8))::BIGINT AS h32, count(*) AS cnt FROM ra GROUP BY k),
        |ha_b AS (SELECT k, ('0x' || substr(md5(k), 1, 8))::BIGINT AS h32, count(*) AS cnt FROM lb GROUP BY k),
        |hb_b AS (SELECT k, ('0x' || substr(md5(k), 1, 8))::BIGINT AS h32, count(*) AS cnt FROM rb GROUP BY k),
        |ha_c AS (SELECT k, ('0x' || substr(md5(k), 1, 8))::BIGINT AS h32, count(*) AS cnt FROM lc GROUP BY k),
        |hb_c AS (SELECT k, ('0x' || substr(md5(k), 1, 8))::BIGINT AS h32, count(*) AS cnt FROM rc GROUP BY k),
        |ca_a AS (SELECT i, ((h32 * (2*i + 1) + (98765*i + 12345)) % 2147483647) % 128 AS bkt, SUM(cnt) AS v FROM ha_a, range(2) t(i) GROUP BY i, bkt),
        |cb_a AS (SELECT i, ((h32 * (2*i + 1) + (98765*i + 12345)) % 2147483647) % 128 AS bkt, SUM(cnt) AS v FROM hb_a, range(2) t(i) GROUP BY i, bkt),
        |ca_b AS (SELECT i, ((h32 * (2*i + 1) + (98765*i + 12345)) % 2147483647) % 128 AS bkt, SUM(cnt) AS v FROM ha_b, range(2) t(i) GROUP BY i, bkt),
        |cb_b AS (SELECT i, ((h32 * (2*i + 1) + (98765*i + 12345)) % 2147483647) % 128 AS bkt, SUM(cnt) AS v FROM hb_b, range(2) t(i) GROUP BY i, bkt),
        |ca_c AS (SELECT i, ((h32 * (2*i + 1) + (98765*i + 12345)) % 2147483647) % 128 AS bkt, SUM(cnt) AS v FROM ha_c, range(2) t(i) GROUP BY i, bkt),
        |cb_c AS (SELECT i, ((h32 * (2*i + 1) + (98765*i + 12345)) % 2147483647) % 128 AS bkt, SUM(cnt) AS v FROM hb_c, range(2) t(i) GROUP BY i, bkt),
        |ip_a AS (SELECT t.i, COALESCE(SUM(ca_a.v * cb_a.v), 0) AS p FROM range(2) t(i)
        |         LEFT JOIN ca_a ON ca_a.i = t.i
        |         LEFT JOIN cb_a ON cb_a.i = t.i AND cb_a.bkt = ca_a.bkt GROUP BY t.i),
        |ip_b AS (SELECT t.i, COALESCE(SUM(ca_b.v * cb_b.v), 0) AS p FROM range(2) t(i)
        |         LEFT JOIN ca_b ON ca_b.i = t.i
        |         LEFT JOIN cb_b ON cb_b.i = t.i AND cb_b.bkt = ca_b.bkt GROUP BY t.i),
        |ip_c AS (SELECT t.i, COALESCE(SUM(ca_c.v * cb_c.v), 0) AS p FROM range(2) t(i)
        |         LEFT JOIN ca_c ON ca_c.i = t.i
        |         LEFT JOIN cb_c ON cb_c.i = t.i AND cb_c.bkt = ca_c.bkt GROUP BY t.i),
        |rows_ AS (
        |  SELECT 'a_dim' AS scenario,
        |    (SELECT count(*) FROM la) AS n_left,
        |    (SELECT count(*) FROM ha_a) AS keys_left,
        |    (SELECT max(cnt) FROM ha_a) AS max_left,
        |    (SELECT count(*) FROM ra) AS n_right,
        |    (SELECT count(*) FROM hb_a) AS keys_right,
        |    (SELECT max(cnt) FROM hb_a) AS max_right,
        |    (SELECT CAST(MIN(p) AS BIGINT) FROM ip_a) AS est_join_rows,
        |    1000000 AS bc
        |  UNION ALL SELECT 'b_uniform',
        |    (SELECT count(*) FROM lb), (SELECT count(*) FROM ha_b),
        |    (SELECT max(cnt) FROM ha_b),
        |    (SELECT count(*) FROM rb), (SELECT count(*) FROM hb_b),
        |    (SELECT max(cnt) FROM hb_b),
        |    (SELECT CAST(MIN(p) AS BIGINT) FROM ip_b), 100
        |  UNION ALL SELECT 'c_skewed',
        |    (SELECT count(*) FROM lc), (SELECT count(*) FROM ha_c),
        |    (SELECT max(cnt) FROM ha_c),
        |    (SELECT count(*) FROM rc), (SELECT count(*) FROM hb_c),
        |    (SELECT max(cnt) FROM hb_c),
        |    (SELECT CAST(MIN(p) AS BIGINT) FROM ip_c), 100),
        |calc AS (SELECT *,
        |    CAST(max_left AS DOUBLE) * CAST(greatest(keys_left, 1) AS DOUBLE)
        |      / CAST(greatest(n_left, 1) AS DOUBLE) AS rl,
        |    CAST(max_right AS DOUBLE) * CAST(greatest(keys_right, 1) AS DOUBLE)
        |      / CAST(greatest(n_right, 1) AS DOUBLE) AS rr
        |  FROM rows_)
        |SELECT scenario, n_left, keys_left, max_left, n_right, keys_right, max_right,
        |  est_join_rows,
        |  CASE WHEN n_right <= bc THEN 'broadcast_right'
        |       WHEN n_left <= bc THEN 'broadcast_left'
        |       WHEN greatest(rl, rr) >= 4.0 THEN 'salted_shuffle'
        |       ELSE 'shuffle' END AS recommendation,
        |  CAST(CASE WHEN n_right > bc AND n_left > bc AND greatest(rl, rr) >= 4.0
        |            THEN least(64, CAST(ceil(greatest(rl, rr)) AS BIGINT))
        |            ELSE 1 END AS INT) AS salt_factor
        |FROM calc ORDER BY scenario""".stripMargin,

    "q_val_ref_integrity" ->
      """WITH par AS (SELECT DISTINCT c_custkey FROM customer
        |             WHERE c_custkey % 10 <> 0 AND c_custkey IS NOT NULL),
        |orph AS (SELECT o.o_custkey FROM orders o
        |         LEFT JOIN par p ON p.c_custkey = o.o_custkey
        |         WHERE o.o_custkey IS NOT NULL AND p.c_custkey IS NULL)
        |SELECT (SELECT count(*) FROM orders) AS n_child,
        |       (SELECT count(*) FROM orph) AS n_orphan_rows,
        |       (SELECT count(DISTINCT o_custkey) FROM orph) AS n_orphan_keys""".stripMargin,

    "q_val_constraints" ->
      """WITH t AS (SELECT count(*) AS n_rows,
        |  count(*) FILTER (WHERE NOT COALESCE(value > 0, FALSE)) AS v1,
        |  count(*) FILTER (WHERE NOT COALESCE(value <= 100, FALSE)) AS v2,
        |  count(*) FILTER (WHERE props IS NULL) AS v3,
        |  count(*) FILTER (WHERE NOT COALESCE(user_id > 0, FALSE)) AS v4
        |  FROM events)
        |SELECT 'props_not_null' AS "constraint", n_rows, v3 AS n_violations FROM t
        |UNION ALL SELECT 'user_positive', n_rows, v4 FROM t
        |UNION ALL SELECT 'value_le_100', n_rows, v2 FROM t
        |UNION ALL SELECT 'value_positive', n_rows, v1 FROM t
        |ORDER BY "constraint"""".stripMargin,

    "q_val_winsorize" ->
      """WITH q AS (SELECT quantile_cont(CAST(value AS DOUBLE), 0.05) AS lo,
        |                  quantile_cont(CAST(value AS DOUBLE), 0.95) AS hi
        |           FROM events WHERE value IS NOT NULL)
        |SELECT event_id, value,
        |       least(greatest(CAST(value AS DOUBLE), q.lo), q.hi) AS value_w
        |FROM events, q ORDER BY event_id""".stripMargin,

    "q_val_impute" ->
      """WITH e AS (SELECT event_id, event_type,
        |             CASE WHEN event_id % 13 = 0 THEN NULL ELSE value END AS value
        |           FROM events),
        |m AS (SELECT event_type, quantile_cont(CAST(value AS DOUBLE), 0.5) AS med
        |      FROM e WHERE value IS NOT NULL AND event_type IS NOT NULL
        |      GROUP BY event_type)
        |SELECT e.event_id, e.event_type, e.value,
        |       COALESCE(CAST(e.value AS DOUBLE), m.med) AS value_f
        |FROM e LEFT JOIN m ON m.event_type = e.event_type
        |ORDER BY e.event_id""".stripMargin,

    "q_profile_ddsketch_group" ->
      """WITH h AS (SELECT event_type AS grp,
        |                  CAST(floor(ln(CAST(value AS DOUBLE))
        |                       / ln((1.0 + 0.01) / (1.0 - 0.01))) AS BIGINT) AS bucket,
        |                  count(*) AS cnt
        |           FROM events
        |           WHERE value IS NOT NULL AND value > 0 AND event_type IS NOT NULL
        |           GROUP BY grp, bucket),
        |c AS (SELECT grp, bucket,
        |             SUM(cnt) OVER (PARTITION BY grp ORDER BY bucket
        |                            ROWS UNBOUNDED PRECEDING) AS cum,
        |             SUM(cnt) OVER (PARTITION BY grp) AS n FROM h),
        |p AS (SELECT UNNEST([0.5, 0.9]) AS p),
        |b AS (SELECT c.grp, p.p, MIN(c.bucket) AS mb, MAX(c.n) AS n
        |      FROM p, c WHERE c.cum > floor(p.p * (c.n - 1)) GROUP BY c.grp, p.p)
        |SELECT grp, p, CAST(n AS BIGINT) AS n,
        |       round(2.0 * pow((1.0 + 0.01) / (1.0 - 0.01), mb + 1)
        |             / ((1.0 + 0.01) / (1.0 - 0.01) + 1), 6) AS est
        |FROM b ORDER BY grp, p""".stripMargin,

    "q_profile_ddsketch" ->
      """WITH h AS (SELECT CAST(floor(ln(CAST(value AS DOUBLE))
        |                          / ln((1.0 + 0.01) / (1.0 - 0.01))) AS BIGINT) AS bucket,
        |                  count(*) AS cnt
        |           FROM events WHERE value IS NOT NULL AND value > 0
        |           GROUP BY bucket),
        |c AS (SELECT bucket, SUM(cnt) OVER (ORDER BY bucket
        |                    ROWS UNBOUNDED PRECEDING) AS cum FROM h),
        |n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM h),
        |p AS (SELECT UNNEST([0.5, 0.9, 0.99]) AS p),
        |b AS (SELECT p.p, MIN(c.bucket) AS mb
        |      FROM p, c, n WHERE c.cum > floor(p.p * (n.n - 1)) GROUP BY p.p)
        |SELECT b.p, n.n,
        |       round(2.0 * pow((1.0 + 0.01) / (1.0 - 0.01), mb + 1)
        |             / ((1.0 + 0.01) / (1.0 - 0.01) + 1), 6) AS est
        |FROM b, n ORDER BY b.p""".stripMargin,

    "q_profile_quantile_sample" ->
      """WITH b AS (SELECT CAST(value AS DOUBLE) AS x
        |           FROM (SELECT value, event_id,
        |                   ('0x' || substr(md5('qsample::' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT AS h
        |                 FROM events WHERE value IS NOT NULL
        |                 ORDER BY h, event_id LIMIT 500)),
        |q AS (SELECT count(*) AS n_sampled,
        |             quantile_cont(x, [0.25, 0.5, 0.75, 0.9]) AS qs FROM b)
        |SELECT n_sampled, UNNEST([0.25, 0.5, 0.75, 0.9]) AS p, UNNEST(qs) AS value
        |FROM q ORDER BY p""".stripMargin,

    "q_ev_rate_spikes" ->
      """WITH e AS (SELECT user_id AS key,
        |             (epoch_us(ts) // 1000000) - ((epoch_us(ts) // 1000000) % 86400) AS bucket
        |           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |c AS (SELECT key, bucket, count(*) AS cnt FROM e GROUP BY key, bucket),
        |s AS (SELECT key, min(bucket) AS lo, max(bucket) AS hi FROM c GROUP BY key),
        |d AS (SELECT s.key, g.bucket
        |      FROM s, UNNEST(generate_series(lo, hi, 86400)) AS g(bucket)),
        |dc AS (SELECT d.key, d.bucket, COALESCE(c.cnt, 0) AS cnt
        |       FROM d LEFT JOIN c ON c.key = d.key AND c.bucket = d.bucket),
        |w AS (SELECT key, bucket, cnt,
        |        count(*) OVER (PARTITION BY key ORDER BY bucket
        |                       ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING) AS trail_n,
        |        SUM(cnt) OVER (PARTITION BY key ORDER BY bucket
        |                       ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING) AS trail_sum
        |      FROM dc)
        |SELECT key, bucket, cnt, trail_n, CAST(trail_sum AS BIGINT) AS trail_sum
        |FROM w
        |WHERE trail_n >= 1 AND cnt >= 5 AND cnt * trail_n > 3 * trail_sum
        |ORDER BY key, bucket""".stripMargin,

    "q_ev_count_anomalies" ->
      """WITH e AS (SELECT event_type AS key,
        |             (epoch_us(ts) // 1000000) - ((epoch_us(ts) // 1000000) % 3600) AS bucket
        |           FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
        |c AS (SELECT key, bucket, count(*) AS cnt FROM e GROUP BY key, bucket),
        |s AS (SELECT key, min(bucket) AS lo, max(bucket) AS hi FROM c GROUP BY key),
        |d AS (SELECT s.key, g.bucket
        |      FROM s, UNNEST(generate_series(lo, hi, 3600)) AS g(bucket)),
        |dc AS (SELECT d.key, d.bucket, COALESCE(c.cnt, 0) AS cnt
        |       FROM d LEFT JOIN c ON c.key = d.key AND c.bucket = d.bucket),
        |m AS (SELECT key, count(*) AS n_buckets, CAST(SUM(cnt) AS BIGINT) AS sum_cnt,
        |             CAST(SUM(cnt * cnt) AS BIGINT) AS sumsq_cnt
        |      FROM dc GROUP BY key)
        |SELECT dc.key, dc.bucket, dc.cnt, m.n_buckets, m.sum_cnt, m.sumsq_cnt
        |FROM dc JOIN m ON m.key = dc.key
        |WHERE (m.n_buckets * dc.cnt - m.sum_cnt) * (m.n_buckets * dc.cnt - m.sum_cnt)
        |      > 9 * (m.n_buckets * m.sumsq_cnt - m.sum_cnt * m.sum_cnt)
        |ORDER BY dc.key, dc.bucket""".stripMargin,

    // both CMS matrices replayed with the shared md5-affine family; the
    // estimate is min over rows of the counter inner product, the exact
    // answer the sum over matching keys of the count product
    "q_profile_joinsize" ->
      """WITH la AS (SELECT CAST(o_custkey AS VARCHAR) AS k FROM orders
        |            WHERE o_custkey IS NOT NULL),
        |rb AS (SELECT CAST(c_custkey AS VARCHAR) AS k FROM customer
        |       WHERE c_custkey IS NOT NULL),
        |ha AS (SELECT k, ('0x' || substr(md5(k), 1, 8))::BIGINT AS h32, count(*) AS cnt
        |       FROM la GROUP BY k),
        |hb AS (SELECT k, ('0x' || substr(md5(k), 1, 8))::BIGINT AS h32, count(*) AS cnt
        |       FROM rb GROUP BY k),
        |ca AS (SELECT i, ((h32 * (2*i + 1) + (98765*i + 12345)) % 2147483647) % 64 AS bkt,
        |              SUM(cnt) AS v
        |       FROM ha, range(4) t(i) GROUP BY i, bkt),
        |cb AS (SELECT i, ((h32 * (2*i + 1) + (98765*i + 12345)) % 2147483647) % 64 AS bkt,
        |              SUM(cnt) AS v
        |       FROM hb, range(4) t(i) GROUP BY i, bkt),
        |ip AS (SELECT t.i, COALESCE(SUM(ca.v * cb.v), 0) AS p
        |       FROM range(4) t(i)
        |       LEFT JOIN ca ON ca.i = t.i
        |       LEFT JOIN cb ON cb.i = t.i AND cb.bkt = ca.bkt
        |       GROUP BY t.i),
        |ex AS (SELECT COALESCE(SUM(a.cnt * b.cnt), 0) AS x
        |       FROM ha a JOIN hb b ON b.k = a.k)
        |SELECT (SELECT CAST(MIN(p) AS BIGINT) FROM ip) AS est_join_rows,
        |       CAST(ex.x AS BIGINT) AS exact_join_rows
        |FROM ex""".stripMargin,

    "q_profile_calibration" ->
      """WITH s AS (SELECT doc_id,
        |             (doc_id % 101) / 100.0 AS score,
        |             ((doc_id % 97) * 10 < (doc_id % 101) * 8) AS label
        |           FROM documents),
        |b AS (SELECT least(CAST(floor(score * 10) AS BIGINT), 9) AS bucket,
        |             CAST(round(score * 10000) AS BIGINT) AS s4,
        |             CASE WHEN label THEN 1 ELSE 0 END AS pos
        |      FROM s)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(pos) AS BIGINT) AS n_pos,
        |       round(sum(s4) / (count(*) * 10000.0), 6) AS mean_score
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_profile_drift" ->
      """WITH r AS (SELECT event_type AS key, count(*) AS ref_cnt FROM events
        |           WHERE event_id % 2 = 0 AND event_type IS NOT NULL
        |           GROUP BY event_type),
        |c AS (SELECT event_type AS key, count(*) AS cur_cnt FROM events
        |      WHERE event_id % 2 = 1 AND event_type IS NOT NULL
        |      GROUP BY event_type),
        |j AS (SELECT COALESCE(r.key, c.key) AS key,
        |             COALESCE(ref_cnt, 0) AS ref_cnt,
        |             COALESCE(cur_cnt, 0) AS cur_cnt
        |      FROM r FULL OUTER JOIN c ON c.key = r.key),
        |t AS (SELECT (SELECT SUM(ref_cnt) FROM r) AS rt,
        |             (SELECT SUM(cur_cnt) FROM c) AS ct),
        |s AS (SELECT key, ref_cnt, cur_cnt,
        |             CAST(ref_cnt AS DOUBLE) / CAST(rt AS DOUBLE) AS p,
        |             CAST(cur_cnt AS DOUBLE) / CAST(ct AS DOUBLE) AS q
        |      FROM j, t)
        |SELECT key, ref_cnt, cur_cnt,
        |  round((greatest(p, 1e-6) - greatest(q, 1e-6))
        |        * ln(greatest(p, 1e-6) / greatest(q, 1e-6)), 6) AS psi,
        |  round((CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2)) ELSE 0 END
        |       + CASE WHEN q > 0 THEN q * ln(q / ((p + q) / 2)) ELSE 0 END) / 2, 6) AS jsd
        |FROM s ORDER BY key""".stripMargin,

    // alpha = 0.05 -> gamma = 1.05/0.95; bucket floor(ln(v)/ln(gamma)),
    // midpoint 2*gamma^(b+1)/(gamma+1) — the ddsketch replay, feeding the
    // identical PSI/JSD count arithmetic as q_profile_drift
    "q_profile_drift_numeric" ->
      """WITH g AS (SELECT ln((1.0 + 0.05) / (1.0 - 0.05)) AS lg,
        |                  (1.0 + 0.05) / (1.0 - 0.05) AS gamma),
        |r AS (SELECT CAST(floor(ln(CAST(value AS DOUBLE)) / lg) AS BIGINT) AS key,
        |             count(*) AS ref_cnt
        |      FROM events, g
        |      WHERE event_id % 2 = 0 AND value IS NOT NULL AND value > 0
        |      GROUP BY 1),
        |c AS (SELECT CAST(floor(ln(CAST(value AS DOUBLE)) / lg) AS BIGINT) AS key,
        |             count(*) AS cur_cnt
        |      FROM events, g
        |      WHERE event_id % 2 = 1 AND value IS NOT NULL AND value > 0
        |      GROUP BY 1),
        |j AS (SELECT COALESCE(r.key, c.key) AS key,
        |             COALESCE(ref_cnt, 0) AS ref_cnt,
        |             COALESCE(cur_cnt, 0) AS cur_cnt
        |      FROM r FULL OUTER JOIN c ON c.key = r.key),
        |t AS (SELECT (SELECT SUM(ref_cnt) FROM r) AS rt,
        |             (SELECT SUM(cur_cnt) FROM c) AS ct),
        |s AS (SELECT key, ref_cnt, cur_cnt,
        |             CAST(ref_cnt AS DOUBLE) / CAST(rt AS DOUBLE) AS p,
        |             CAST(cur_cnt AS DOUBLE) / CAST(ct AS DOUBLE) AS q
        |      FROM j, t)
        |SELECT key AS bucket,
        |  (SELECT round(2.0 * pow(gamma, key + 1) / (gamma + 1.0), 6) FROM g)
        |    AS bucket_mid,
        |  ref_cnt, cur_cnt,
        |  round((greatest(p, 1e-6) - greatest(q, 1e-6))
        |        * ln(greatest(p, 1e-6) / greatest(q, 1e-6)), 6) AS psi,
        |  round((CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2)) ELSE 0 END
        |       + CASE WHEN q > 0 THEN q * ln(q / ((p + q) / 2)) ELSE 0 END) / 2, 6) AS jsd
        |FROM s ORDER BY bucket""".stripMargin
  )
}
