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

  /** Watermarked tumbling (or, with `slide`, hopping) window aggregation
    * for an events stream. Use with append output mode: windows emit once
    * finalized by the watermark. */
  def windowedAgg(
      events: DataFrame,
      duration: String = "1 hour",
      watermarkDelay: String = "1 hour",
      slide: Option[String] = None): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), duration, slide.getOrElse(duration)), col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(FinOps.money(col("value"))).cast("double").as("total"))
      .select(
        col("window").getField("start").as("window_start"),
        col("event_type"), col("cnt"), col("total"))

  /**
   * Watermarked NATIVE session windows — the streaming form of
   * [[graft.ops.Events.sessionizeNative]], identical aggregate expression
   * (the point of preferring `session_window` over custom
   * `flatMapGroupsWithState` state: batch and stream share one declarative
   * plan, and the watermark closes sessions and evicts their state once
   * event time passes `session end + delay`). Append mode: a session row
   * emits exactly once, when finalized.
   */
  def sessionWindowAgg(
      events: DataFrame,
      gap: String = "30 minutes",
      watermarkDelay: String = "1 hour"): DataFrame =
    graft.ops.Events.sessionWindowAgg(
      events.withWatermark("ts", watermarkDelay), gap)

  /**
   * Watermarked stream-stream interval join: every left event paired with
   * the right-stream events of the same key whose time lies in
   * `[left.ts - before, left.ts + after]` — "views within the hour before
   * each purchase" as a CONTINUOUS query. Spark's stream-stream join keeps
   * both sides' state only as long as the watermark + range bound allows,
   * so state is bounded without any custom state management; the time-range
   * predicate is exactly what makes that eviction possible (an
   * unconstrained stream-stream join would buffer forever). Right columns
   * are surfaced with a `r_` prefix.
   */
  def intervalJoin(
      left: DataFrame, right: DataFrame, key: String,
      before: String = "1 hour", after: String = "0 seconds",
      watermarkDelay: String = "1 hour"): DataFrame = {
    val prefixed = right.columns.map("r_" + _)
    val clash = left.columns.toSet.intersect(prefixed.toSet)
    require(clash.isEmpty,
      s"intervalJoin surfaces right columns with a r_ prefix; left already carries $clash")
    val l = left.withWatermark("ts", watermarkDelay)
    // ONE projection renames every right column (a withColumnRenamed fold
    // would cascade when right itself carries an r_-prefixed name)
    val r = right
      .select(right.columns.toIndexedSeq.map(c => col(c).as(s"r_$c")): _*)
      .withWatermark("r_ts", watermarkDelay)
    l.join(
      r,
      col(key) === col(s"r_$key") &&
        col("r_ts") >= col("ts") - expr(s"INTERVAL $before") &&
        col("r_ts") <= col("ts") + expr(s"INTERVAL $after"))
  }
}
