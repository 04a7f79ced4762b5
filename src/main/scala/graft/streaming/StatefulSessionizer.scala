package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class SessionEvent(user_id: Long, tsMs: Long, value: Double)
final case class SessionState(startMs: Long, lastMs: Long, n: Long,
    total: Double)
final case class SessionOut(user_id: Long, session_start_ms: Long,
    n: Long, total: Double)

/** Custom keyed streaming state via flatMapGroupsWithState
  * (SURVEY.md §2.9): gap-based sessionization with explicit state,
  * event-time timeout, and emitted sessions on expiry — the
  * KeyValueGroupedDataset API the engine exposes for state machines that
  * session_window can't express (e.g. value-dependent gaps, early
  * emission, enrichment joins against state).
  *
  * The batch analog in [[graft.operators.StreamingQueries]] (q34) covers
  * correctness against the oracle; this class is the streaming-native
  * path, exercised by its spec with an explicit event sequence.
  */
object StatefulSessionizer {
  val GapMs: Long = 30 * 60 * 1000L

  def sessionize(events: Dataset[SessionEvent],
      watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts", timestamp_millis(col("tsMs")))
      .withWatermark("ts", watermarkDelay)
      .as[(Long, Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Long, Double, java.sql.Timestamp)],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, s.startMs, s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { case (_, ms, v, _) =>
              cur match {
                case Some(s) if ms - s.lastMs < GapMs =>
                  cur = Some(s.copy(lastMs = ms, n = s.n + 1,
                    total = s.total + v))
                case Some(s) =>
                  closed += SessionOut(user, s.startMs, s.n, s.total)
                  cur = Some(SessionState(ms, ms, 1, v))
                case None =>
                  cur = Some(SessionState(ms, ms, 1, v))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + GapMs)
            }
            closed.result().iterator
          }
      }
  }
}
