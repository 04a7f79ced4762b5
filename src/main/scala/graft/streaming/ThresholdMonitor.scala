package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class CumRow(user_id: Long, event_id: Long, tsUs: Long,
    cents: Long)
final case class CumState(cents: Long, n: Long, crossed: Boolean)
final case class CrossOut(user_id: Long, cross_ts_us: Long,
    n_at_cross: Long, cum_cents: Long)

/** First-threshold-crossing monitor — the mid-stream-emission stateful
  * pattern (alerting / budget caps / fraud cutoffs): per key, accumulate
  * a running total and emit EXACTLY ONE row the moment it first reaches
  * the threshold, then go quiet. Unlike the sessionizer (which emits on
  * state EXPIRY) this emits while the key is still live, which is the
  * shape `session_window`/windowed aggs cannot express at all — the
  * reason `flatMapGroupsWithState` exists.
  *
  * Money is accumulated as exact integer cents (the DataFrame side
  * pre-casts through DECIMAL(12,2), the engine-parity cast), so the
  * running total is order-insensitive and overflow-checked by Long
  * arithmetic, and state per key is three fixed-width fields — bounded
  * regardless of stream length. Rows within a micro-batch are sorted by
  * (event time, event_id) before folding, matching the deterministic
  * event-time order the batch oracle uses.
  */
object ThresholdMonitor {

  def firstCrossing(rows: Dataset[CumRow], thresholdCents: Long)
      : Dataset[CrossOut] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.user_id)
      .flatMapGroupsWithState[CumState, CrossOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[CumRow], state: GroupState[CumState]) =>
          var st = state.getOption.getOrElse(CumState(0L, 0L, false))
          val out = Seq.newBuilder[CrossOut]
          if (!st.crossed) {
            it.toSeq.sortBy(r => (r.tsUs, r.event_id)).foreach { r =>
              if (!st.crossed) {
                val cum = math.addExact(st.cents, r.cents)
                st = CumState(cum, st.n + 1, cum >= thresholdCents)
                if (st.crossed)
                  out += CrossOut(user, r.tsUs, st.n, cum)
              }
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}
