package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.FinOps

/**
 * Structured-Streaming forms of the event analytics: event-time tumbling
 * windows with a watermark bounding state. The transformation is identical to
 * the batch [[graft.ops.Events.windowedAgg]] — `readStream` in, the same
 * declarative aggregate, `writeStream` out; the watermark is what lets Spark
 * drop window state once event time passes `window end + delay` (without it,
 * 100 TB of stream history accumulates in the state store).
 */
object EventStream {

  /** Watermarked tumbling-window aggregation for an events stream. Use with
    * append output mode: windows emit once finalized by the watermark. */
  def windowedAgg(
      events: DataFrame,
      duration: String = "1 hour",
      watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), duration), col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(FinOps.money(col("value"))).cast("double").as("total"))
      .select(
        col("window").getField("start").as("window_start"),
        col("event_type"), col("cnt"), col("total"))
}
