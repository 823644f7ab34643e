package graft

import graft.streaming.Sessionize
import graft.streaming.Sessionize.{ClosedSession, Event}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Custom-state sessionization: sessions split on the inactivity gap and
  * close exactly when the watermark passes end + gap. */
class SessionizeSpec extends SparkSpec {

  test("flatMapGroupsWithState emits closed sessions on event-time timeout") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    def t(x: String) = java.sql.Timestamp.valueOf(x)

    val mem = MemoryStream[Event]
    val sessions = Sessionize.sessions(
      mem.toDS().withWatermark("ts", "0 seconds").as[Event],
      gapMs = 30 * 60 * 1000L)
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // User 1: two bursts 2h apart; user 2: one event.
      mem.addData(
        Event(1, t("2024-01-01 10:00:00"), 1.0),
        Event(1, t("2024-01-01 10:10:00"), 2.0),
        Event(2, t("2024-01-01 10:05:00"), 5.0))
      q.processAllAvailable()
      mem.addData(Event(1, t("2024-01-01 12:00:00"), 3.0))
      q.processAllAvailable()
      // Push the watermark far past everything → all sessions close.
      mem.addData(Event(99, t("2024-01-01 23:00:00"), 0.0))
      q.processAllAvailable()

      val out = spark.table("sess_out").as[ClosedSession].collect()
        .map(c => (c.user_id, c.session_start.toString, c.n_events, c.total_value))
        .toSet
      assert(out.contains((1L, "2024-01-01 10:00:00.0", 2, 3.0)),
        s"burst 1 wrong: $out")
      assert(out.contains((1L, "2024-01-01 12:00:00.0", 1, 3.0)))
      assert(out.contains((2L, "2024-01-01 10:05:00.0", 1, 5.0)))
    } finally q.stop()
  }
}
