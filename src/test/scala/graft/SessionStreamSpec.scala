package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.SessionStream
import graft.streaming.SessionStream.Event

class SessionStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("stateful sessionizer closes sessions on gap and on watermark timeout") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = SessionStream.sessionize(ms.toDS(), gapMinutes = 30, watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("sessions_out").outputMode("append").start()
    try {
      // session 1: two events 10 min apart; then a 2-hour gap opens session 2
      ms.addData(
        Event(7L, ts("2024-01-01 10:00:00"), 1.5),
        Event(7L, ts("2024-01-01 10:10:00"), 2.25))
      q.processAllAvailable()
      ms.addData(Event(7L, ts("2024-01-01 12:30:00"), 4.0))
      q.processAllAvailable()
      // new-event path: session 1 closed by the gap
      val afterGap = spark.table("sessions_out").as[SessionStream.ClosedSession].collect()
      assert(afterGap.toSeq == Seq(
        SessionStream.ClosedSession(7L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), 2L, 3.75)))

      // timeout path: advance the watermark far past session 2's horizon
      ms.addData(Event(8L, ts("2024-01-01 15:00:00"), 9.0))
      q.processAllAvailable()
      ms.addData(Event(8L, ts("2024-01-01 15:00:30"), 1.0)) // extra batch so the timeout fires
      q.processAllAvailable()
      val afterTimeout = spark.table("sessions_out").as[SessionStream.ClosedSession].collect()
      assert(afterTimeout.exists(s =>
        s.user_id == 7L && s.session_start == ts("2024-01-01 12:30:00") && s.n_events == 1L && s.total_value == 4.0))
    } finally q.stop()
  }
}
