package graft

import graft.streaming.{SessionEvent, SessionOut, StatefulSessionizer}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Drives the flatMapGroupsWithState sessionizer through a MemoryStream:
  * in-batch gap detection emits a closed session; a later event advances
  * the watermark and expires the stale session via event-time timeout.
  */
class StatefulSessionizerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("gap closes sessions in-batch and on event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000000L // fixed epoch ms
    val min = 60 * 1000L
    val input = MemoryStream[SessionEvent]
    val out = StatefulSessionizer.sessionize(input.toDS(),
      watermarkDelay = "1 minute")
    val q = out.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sessions_out")
      .start()
    try {
      // user 1: two events 5 min apart, then one 40 min later
      // (in-batch gap → first session closes with n=2)
      input.addData(
        SessionEvent(1L, t0, 1.0),
        SessionEvent(1L, t0 + 5 * min, 2.0),
        SessionEvent(1L, t0 + 45 * min, 3.0))
      q.processAllAvailable()
      // far-future event for user 2 pushes the watermark past
      // (t0+45min)+gap → user 1's open session times out
      input.addData(SessionEvent(2L, t0 + 300 * min, 9.0))
      q.processAllAvailable()
      input.addData(SessionEvent(2L, t0 + 600 * min, 9.0))
      q.processAllAvailable()

      val got = spark.table("sessions_out").as[SessionOut].collect()
        .sortBy(s => (s.user_id, s.session_start_ms))
      assert(got.exists(s => s.user_id == 1 &&
        s.session_start_ms == t0 && s.n == 2 && s.total == 3.0),
        got.mkString(", "))
      assert(got.exists(s => s.user_id == 1 &&
        s.session_start_ms == t0 + 45 * min && s.n == 1 && s.total == 3.0),
        got.mkString(", "))
    } finally q.stop()
  }
}
