package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** [[FunnelEvent]] plus the event-time column the watermark rides on
  * (`timestamp_micros(tsUs)`); the column must survive into the
  * stateful operator for the watermark to be defined there.
  */
final case class FunnelEventT(user_id: Long, tsUs: Long,
    event_type: String, ets: java.sql.Timestamp)

/** Buffered per-user state: funnel progress plus the events newer than
  * the current watermark, held back until no earlier event can still
  * arrive.
  */
final case class BufferedFunnelState(stage: Int, t1: Long, t2: Long,
    t3: Long, pending: Seq[FunnelEvent])

/** The watermark-buffered sibling of [[FunnelTracker]] — the variant
  * that is correct under MULTI-batch, out-of-order delivery.
  *
  * [[FunnelTracker]]'s greedy fold assumes no event older than an
  * already-consumed one arrives in a later micro-batch (q90 fails
  * loudly otherwise). This tracker removes that assumption the standard
  * Structured-Streaming way: incoming events are appended to the
  * group's state buffer; only events at or below the CURRENT event-time
  * watermark are folded (in event-time order — the watermark contract
  * says nothing earlier can still arrive); the rest wait. A group with
  * a non-empty buffer arms an event-time timeout at its earliest
  * pending event, so the flush happens even if the user never produces
  * another row — Spark's no-data micro-batch after a watermark advance
  * delivers the timeout, which is what drains the tail when the source
  * ends. State stays bounded by the watermark delay: the buffer holds
  * at most `delay` worth of one user's events, and the fold discards
  * them as the watermark passes.
  *
  * With `delay = 0` over an in-order source this produces exactly
  * [[FunnelTracker]]'s output one watermark-beat later, which is why it
  * shares q83's batch oracle (q114).
  */
object BufferedFunnelTracker {

  def track(events: Dataset[FunnelEvent], stepUs: Long,
      delay: String = "0 seconds"): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    val withTs = events
      .withColumn("ets", expr("timestamp_micros(tsUs)"))
      .withWatermark("ets", delay)
      .select(col("user_id"), col("tsUs"), col("event_type"), col("ets"))
      .as[FunnelEventT]
    withTs.groupByKey(_.user_id)
      .flatMapGroupsWithState[BufferedFunnelState, FunnelProgress](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[FunnelEventT],
         state: GroupState[BufferedFunnelState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val st = state.getOption
            .getOrElse(BufferedFunnelState(0, -1L, -1L, -1L, Nil))
          val incoming = rows
            .map(e => FunnelEvent(e.user_id, e.tsUs, e.event_type)).toSeq
          val (ready, pend) =
            (st.pending ++ incoming).partition(_.tsUs <= wmUs)
          var (stage, t1, t2, t3) = (st.stage, st.t1, st.t2, st.t3)
          ready.sortBy(_.tsUs).foreach { e =>
            e.event_type match {
              case "view" if t1 < 0 =>
                stage = 1; t1 = e.tsUs
              case "click" if t1 >= 0 && t2 < 0 &&
                  e.tsUs > t1 && e.tsUs <= t1 + stepUs =>
                stage = 2; t2 = e.tsUs
              case "purchase" if t2 >= 0 && t3 < 0 &&
                  e.tsUs > t2 && e.tsUs <= t2 + stepUs =>
                stage = 3; t3 = e.tsUs
              case _ => ()
            }
          }
          state.update(BufferedFunnelState(stage, t1, t2, t3, pend))
          if (pend.nonEmpty)
            // wake this group once the watermark passes its earliest
            // pending event (strictly above the current watermark by
            // the partition above, so the required ts > wm holds)
            state.setTimeoutTimestamp(pend.map(_.tsUs).min / 1000L + 1L)
          Iterator.single(FunnelProgress(user, stage, t1, t2, t3))
      }
  }
}
