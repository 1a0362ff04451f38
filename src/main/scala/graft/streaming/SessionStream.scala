package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Stateful streaming sessionization — the `flatMapGroupsWithState` form of
 * [[graft.ops.Events.sessionize]]: per-user custom state holds the open
 * session; a session closes (and is emitted, append-mode) when a new event
 * arrives past the inactivity gap, or when the event-time timeout fires after
 * the watermark passes `last event + gap`.
 *
 * State is one small record per ACTIVE user — the watermark timeout is what
 * keeps that bounded on an unbounded stream (idle users' state is reaped and
 * their last session flushed).
 */
object SessionStream {

  case class Event(user_id: Long, ts: Timestamp, value: Double)

  case class OpenSession(startUs: Long, lastUs: Long, nEvents: Long, totalCents: Long)

  case class ClosedSession(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long,
      total_value: Double)

  private def close(userId: Long, s: OpenSession): ClosedSession =
    ClosedSession(
      userId,
      new Timestamp(s.startUs / 1000),
      new Timestamp(s.lastUs / 1000),
      s.nEvents,
      s.totalCents / 100.0)

  private def us(t: Timestamp): Long = t.getTime * 1000

  /**
   * The state-transition function. Exposed for direct unit testing; streaming
   * queries go through [[sessionize]].
   */
  def updateUser(gapUs: Long)(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val closed = state.getOption.map(s => close(userId, s)).iterator
      state.remove()
      closed
    } else {
      val sorted = events.toSeq.sortBy(e => (us(e.ts), e.value))
      var open = state.getOption
      val closed = Seq.newBuilder[ClosedSession]
      sorted.foreach { e =>
        val t = us(e.ts)
        val cents = math.round(e.value * 100)
        open match {
          case Some(s) if t - s.lastUs <= gapUs =>
            open = Some(OpenSession(s.startUs, t, s.nEvents + 1, s.totalCents + cents))
          case Some(s) =>
            closed += close(userId, s)
            open = Some(OpenSession(t, t, 1, cents))
          case None =>
            open = Some(OpenSession(t, t, 1, cents))
        }
      }
      open.foreach { s =>
        state.update(s)
        // flush via timeout once the watermark passes the gap horizon
        state.setTimeoutTimestamp(s.lastUs / 1000 + gapUs / 1000)
      }
      closed.result().iterator
    }
  }

  /** Watermarked streaming sessionization; emits closed sessions (append). */
  def sessionize(
      events: Dataset[Event],
      gapMinutes: Int = 30,
      watermarkDelay: String = "10 minutes"): Dataset[ClosedSession] = {
    implicit val closedEnc = Encoders.product[ClosedSession]
    implicit val openEnc = Encoders.product[OpenSession]
    implicit val longEnc = Encoders.scalaLong
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        updateUser(gapUs))
  }
}
