package graft

import graft.streaming.{FunnelEvent, FunnelProgress, FunnelTracker}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Drives the streaming funnel FSM through a MemoryStream across
  * several micro-batches: state persists between batches, step windows
  * gate transitions, and emissions stay monotone per user.
  */
class FunnelTrackerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val H = 3600L * 1000000L // 1 h in µs

  private def run(batches: Seq[Seq[FunnelEvent]]): Seq[FunnelProgress] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val name = s"funnel_out_${System.nanoTime()}"
    val q = FunnelTracker.track(input.toDS(), stepUs = 6 * H)
      .writeStream.outputMode("update").format("memory")
      .queryName(name).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(name).as[FunnelProgress].collect().toSeq
    } finally q.stop()
  }

  test("state persists across micro-batches and step windows gate " +
      "transitions") {
    val t0 = 1700000000L * 1000000L
    val out = run(Seq(
      // batch 1: user 1 views; user 2 clicks with no prior view (noop)
      Seq(FunnelEvent(1, t0, "view"), FunnelEvent(2, t0, "click")),
      // batch 2: user 1 clicks within 6 h (advances), then purchases
      // 7 h after the click — outside the step window (noop)
      Seq(FunnelEvent(1, t0 + 2 * H, "click"),
        FunnelEvent(1, t0 + 9 * H, "purchase")),
      // batch 3: user 1 purchases again — but t2+6h has passed, so
      // still stage 2; user 2 finally views (stage 1)
      Seq(FunnelEvent(1, t0 + 10 * H, "purchase"),
        FunnelEvent(2, t0 + 1 * H, "view"))))
    val finalByUser = out.groupBy(_.user_id).view
      .mapValues(_.maxBy(p => (p.stage, p.t1, p.t2, p.t3))).toMap
    assert(finalByUser(1L).stage == 2)
    assert(finalByUser(1L).t1 == t0 && finalByUser(1L).t2 == t0 + 2 * H)
    assert(finalByUser(2L).stage == 1)
  }

  test("complete funnel in one batch; within-batch fold is event-time " +
      "ordered regardless of input order") {
    val t0 = 1800000000L * 1000000L
    // events deliberately out of order in the batch: the purchase and
    // click arrive before the view in arrival order
    val out = run(Seq(Seq(
      FunnelEvent(7, t0 + 3 * H, "purchase"),
      FunnelEvent(7, t0 + 1 * H, "click"),
      FunnelEvent(7, t0, "view"))))
    val fin = out.filter(_.user_id == 7L)
      .maxBy(p => (p.stage, p.t1, p.t2, p.t3))
    assert(fin.stage == 3)
    assert(fin.t1 == t0 && fin.t2 == t0 + 1 * H && fin.t3 == t0 + 3 * H)
  }

  test("first view wins: a second view never re-arms the funnel") {
    val t0 = 1900000000L * 1000000L
    val out = run(Seq(
      Seq(FunnelEvent(3, t0, "view")),
      // 2nd view 20 h later must NOT reset t1; click 21 h after first
      // view is outside ITS window → stage stays 1
      Seq(FunnelEvent(3, t0 + 20 * H, "view"),
        FunnelEvent(3, t0 + 21 * H, "click"))))
    val fin = out.filter(_.user_id == 3L)
      .maxBy(p => (p.stage, p.t1, p.t2, p.t3))
    assert(fin.stage == 1 && fin.t1 == t0)
  }

  test("single-batch guard: q90's oracle contract fails loudly when " +
      "data arrives across multiple micro-batches") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_two_batch").toString
    // two parquet files + maxFilesPerTrigger=1 → two data batches
    Seq((1L, "a")).toDF("k", "v").write.mode("append").parquet(dir)
    Seq((2L, "b")).toDF("k", "v").write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val agg = stream.groupBy(col("k")).count()
    val e = intercept[IllegalStateException] {
      graft.streaming.EventsStream.runToCompletion(spark, agg,
        requireSingleBatch = true)
    }
    assert(e.getMessage.contains("single-batch"))
    // and the same shape under the default (no guard) still drains fine
    val ok = graft.streaming.EventsStream.runToCompletion(spark,
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(dir).groupBy(col("k")).count())
    assert(ok.count() == 2)
  }

  // ---- q114: the watermark-BUFFERED tracker --------------------------

  private def runBuffered(batches: Seq[Seq[FunnelEvent]],
      delay: String): Seq[FunnelProgress] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val name = s"funnel_buf_out_${System.nanoTime()}"
    val q = graft.streaming.BufferedFunnelTracker
      .track(input.toDS(), stepUs = 6 * H, delay = delay)
      .writeStream.outputMode("update").format("memory")
      .queryName(name).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(name).as[FunnelProgress].collect().toSeq
    } finally q.stop()
  }

  private def finalOf(out: Seq[FunnelProgress], user: Long) =
    out.filter(_.user_id == user).maxBy(p => (p.stage, p.t1, p.t2, p.t3))

  test("q114 buffered: multi-batch in-order delivery completes the " +
      "funnel WITHOUT any single-batch assumption") {
    val t0 = 2000000000L * 1000000L
    // one step per micro-batch — exactly the delivery q90's guard
    // rejects; the trailing event advances the watermark past the
    // purchase so the tail drains (delay 0: wm = max seen event time)
    val out = runBuffered(Seq(
      Seq(FunnelEvent(1, t0, "view")),
      Seq(FunnelEvent(1, t0 + 2 * H, "click")),
      Seq(FunnelEvent(1, t0 + 4 * H, "purchase")),
      Seq(FunnelEvent(99, t0 + 30 * H, "view"))), delay = "0 seconds")
    val fin = finalOf(out, 1L)
    assert(fin.stage == 3)
    assert(fin.t1 == t0 && fin.t2 == t0 + 2 * H && fin.t3 == t0 + 4 * H)
  }

  test("q114 buffered: cross-batch OUT-OF-ORDER arrival inside the " +
      "watermark delay folds in event-time order (greedy would fail)") {
    val t0 = 2100000000L * 1000000L
    // purchase arrives FIRST, view LAST — the greedy tracker would
    // discard all three; with a 12 h delay the watermark stays behind
    // them until the flush event, then folds t0 -> t0+1H -> t0+3H
    val out = runBuffered(Seq(
      Seq(FunnelEvent(7, t0 + 3 * H, "purchase")),
      Seq(FunnelEvent(7, t0 + 1 * H, "click")),
      Seq(FunnelEvent(7, t0, "view")),
      Seq(FunnelEvent(99, t0 + 30 * H, "view"))), delay = "12 hours")
    val fin = finalOf(out, 7L)
    assert(fin.stage == 3)
    assert(fin.t1 == t0 && fin.t2 == t0 + 1 * H && fin.t3 == t0 + 3 * H)
    // and the event-time-timeout path drained user 7 without user 7
    // ever appearing in the flushing batch
  }

  test("q114 buffered: events beyond the watermark stay pending and " +
      "emissions remain monotone") {
    val t0 = 2200000000L * 1000000L
    // no flush event: with a 12 h delay the purchase at t0+3H is never
    // released (wm never passes it), so the funnel must report the
    // stage the WATERMARK can prove, not the optimistic one
    val out = runBuffered(Seq(
      Seq(FunnelEvent(5, t0, "view"), FunnelEvent(5, t0 + 1 * H, "click"),
        FunnelEvent(5, t0 + 3 * H, "purchase"))), delay = "12 hours")
    val fin = finalOf(out, 5L)
    assert(fin.stage == 0, s"nothing is provable yet: $fin")
    // per-user emissions never regress a stage
    val stages = out.filter(_.user_id == 5L).map(_.stage)
    assert(stages.sorted == stages)
  }
}
