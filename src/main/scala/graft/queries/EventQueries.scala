package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Events

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
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_ev_window_hour" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS cnt,
        |  CAST(SUM(CAST(round(value, 2) AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY window_start, event_type
        |ORDER BY window_start, event_type""".stripMargin,

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

    "q_ev_asof" ->
      """WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, ts, event_id AS view_event, value AS view_value, ts AS view_ts
        |      FROM events WHERE event_type = 'view')
        |SELECT p.event_id, p.user_id, p.ts, p.value, v.view_event, v.view_value, v.view_ts
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY p.event_id""".stripMargin
  )
}
