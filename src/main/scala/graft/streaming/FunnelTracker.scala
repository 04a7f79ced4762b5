package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class FunnelEvent(user_id: Long, tsUs: Long, event_type: String)

/** Per-user funnel progress. Unset timestamps are -1 so the state is a
  * flat primitive struct (no Option boxing in state serialization) and
  * the latest emission per user is simply the max of
  * `struct(stage, t1, t2, t3)` — each field only ever moves from -1 to
  * a final value, so emissions are monotone per user.
  */
final case class FunnelProgress(user_id: Long, stage: Int,
    t1: Long, t2: Long, t3: Long)

/** Streaming 3-step funnel (view → click → purchase, each step within
  * `stepUs` of the previous) as a keyed state machine — the
  * flatMapGroupsWithState twin of the batch window formulation in
  * [[graft.operators.EventAnalytics.q83Funnel]], sharing its oracle.
  *
  * Per-user state is three timestamps — O(1) regardless of how many
  * events a user produces, which is what lets the operator run forever
  * on an unbounded stream. Each micro-batch folds its events in
  * event-time order and emits the user's current progress in Update
  * mode; because every transition only fills a previously-unset step,
  * progress rows are monotone and the final state is recoverable
  * downstream as a plain max.
  *
  * In-order guarantee: within a batch events are sorted by event time;
  * across batches the greedy fold assumes time-ordered arrival (true
  * for time-partitioned file sources; an out-of-order earlier view
  * arriving after a later view was consumed would need
  * watermark-buffered reordering, the same trade the gap sessionizer
  * documents).
  */
object FunnelTracker {

  def track(events: Dataset[FunnelEvent],
      stepUs: Long): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelProgress, FunnelProgress](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[FunnelEvent],
         state: GroupState[FunnelProgress]) =>
          var s = state.getOption
            .getOrElse(FunnelProgress(user, 0, -1L, -1L, -1L))
          rows.toSeq.sortBy(_.tsUs).foreach { e =>
            e.event_type match {
              case "view" if s.t1 < 0 =>
                s = s.copy(stage = 1, t1 = e.tsUs)
              case "click" if s.t1 >= 0 && s.t2 < 0 &&
                  e.tsUs > s.t1 && e.tsUs <= s.t1 + stepUs =>
                s = s.copy(stage = 2, t2 = e.tsUs)
              case "purchase" if s.t2 >= 0 && s.t3 < 0 &&
                  e.tsUs > s.t2 && e.tsUs <= s.t2 + stepUs =>
                s = s.copy(stage = 3, t3 = e.tsUs)
              case _ => ()
            }
          }
          state.update(s)
          Iterator.single(s)
      }
  }
}
