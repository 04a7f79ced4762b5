package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Drives q120's left-outer stream-stream join across micro-batches:
  *
  *  - a click matched inside its 10-min window emits immediately;
  *  - an unmatched click emits a NULL-extended row only after the
  *    watermark passes its match window (the outcome is settled — no
  *    future purchase can match);
  *  - a click whose window the watermark has not passed stays pending
  *    (exactly the tail cohort q120 excludes);
  *  - decided state EVICTS from the store — the property that bounds
  *    join state to the (delay + window) frontier at ingest scale
  *    instead of every click ever seen.
  */
class StreamOuterJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("outer join: match emits immediately, unmatched click " +
      "null-extends after watermark passes, tail stays pending, " +
      "state evicts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000000L // ms
    def ts(deltaMin: Long) = new Timestamp(t0 + deltaMin * 60000)

    val input = MemoryStream[(Long, Long, Timestamp, String, Double)]
    val events = input.toDS()
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val joined = graft.streaming.EventsStream.clickToPurchaseOuter(events)
    val name = s"outer_join_${System.nanoTime()}"
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      // batch 1: click A (user 1) + its purchase at +5 min → matched
      // row emits now; click B (user 2) has no purchase yet
      input.addData(
        (100L, 1L, ts(0), "click", 0.0),
        (101L, 2L, ts(0), "click", 0.0),
        (200L, 1L, ts(5), "purchase", 9.99))
      q.processAllAvailable()
      val afterB1 = spark.table(name).collect()
      assert(afterB1.map(r => (r.getLong(1), Option(r.get(3)))).toSet ==
        Set((100L, Some(200L))),
        s"batch1 should emit only the matched pair: ${afterB1.toSeq}")

      // batch 2: far-future click + purchase advance BOTH stream
      // watermarks to ~+50 min — past B's match window (+10 min) +
      // delay (10 min) → B's null row emits; the +60 min rows are
      // themselves still pending
      input.addData(
        (102L, 3L, ts(60), "click", 0.0),
        (201L, 99L, ts(60), "purchase", 1.0))
      q.processAllAvailable()

      val rows = spark.table(name).collect()
        .map(r => (r.getLong(1), Option(r.get(3)))).toSet
      assert(rows == Set((100L, Some(200L)), (101L, None)),
        s"expected A matched + B null-extended, pending tail withheld: " +
          s"$rows")

      // eviction: decided clicks left the store — remaining state is
      // the pending frontier (the +60 min click/purchase), not every
      // row ever seen
      val state = q.lastProgress.stateOperators
      assert(state.nonEmpty, "no state operator reported")
      val total = state.map(_.numRowsTotal).sum
      assert(total <= 3,
        s"join state not bounded to the pending frontier: $total rows " +
          s"(${state.map(_.numRowsTotal).toSeq})")
      val removed = state.map(_.numRowsRemoved).sum
      assert(removed > 0, "no state rows were evicted")
    } finally q.stop()
  }
}
