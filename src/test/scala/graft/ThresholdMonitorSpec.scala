package graft

import graft.streaming.{CrossOut, CumRow, ThresholdMonitor}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Drives the first-crossing monitor through a MemoryStream across
  * multiple micro-batches: the crossing emits exactly once, at the
  * right event, and later batches for an already-crossed key stay
  * silent (the state machine's whole point).
  */
class ThresholdMonitorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("emits exactly one crossing per key, at the crossing event, " +
      "and never again after") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CumRow]
    val out = ThresholdMonitor.firstCrossing(input.toDS(), 1000L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("cross_out").start()
    try {
      // user 1 crosses on its third event; user 2 stays below
      input.addData(
        CumRow(1L, 10L, 100L, 400L),
        CumRow(1L, 11L, 200L, 400L),
        CumRow(1L, 12L, 300L, 300L),
        CumRow(2L, 20L, 100L, 900L))
      q.processAllAvailable()
      // second batch: user 1 already crossed (must NOT re-emit);
      // user 2 crosses now
      input.addData(
        CumRow(1L, 13L, 400L, 5000L),
        CumRow(2L, 21L, 200L, 100L))
      q.processAllAvailable()

      val got = spark.table("cross_out").as[CrossOut].collect()
        .sortBy(_.user_id)
      assert(got.length == 2, got.mkString(", "))
      assert(got(0) == CrossOut(1L, 300L, 3L, 1100L))
      assert(got(1) == CrossOut(2L, 200L, 2L, 1000L))
    } finally q.stop()
  }

  test("rows within a batch fold in (ts, event_id) order, not arrival " +
      "order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CumRow]
    val out = ThresholdMonitor.firstCrossing(input.toDS(), 500L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("cross_order_out").start()
    try {
      // arrival order is reversed; event-time order crosses at ts=20
      input.addData(
        CumRow(7L, 3L, 30L, 300L),
        CumRow(7L, 2L, 20L, 300L),
        CumRow(7L, 1L, 10L, 300L))
      q.processAllAvailable()
      val got = spark.table("cross_order_out").as[CrossOut].collect()
      assert(got.toSeq == Seq(CrossOut(7L, 20L, 2L, 600L)))
    } finally q.stop()
  }
}
