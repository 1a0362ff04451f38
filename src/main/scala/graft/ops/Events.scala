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
   * Tumbling event-time windows: per (window, event_type) counts and money
   * totals. A plain hash aggregate on the derived window start — one shuffle,
   * partial aggregation map-side.
   */
  def windowedAgg(events: DataFrame, duration: String = "1 hour"): DataFrame =
    events
      .groupBy(
        window(col("ts"), duration).getField("start").as("window_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(FinOps.money(col("value"))).cast("double").as("total"))

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
}
