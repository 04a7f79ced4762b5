package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Drives `dropDuplicatesWithinWatermark` — the bounded-state dedup
  * q112 runs over the document stream — across micro-batches:
  *
  *  - a duplicate arriving while its key's state is live is DROPPED;
  *  - once the watermark passes the key's event time + delay, the
  *    state is EVICTED and a late re-arrival of the same key passes
  *    through again (the trade that keeps a year-long ingest at hours
  *    of state instead of the full distinct-hash history — exactly
  *    what q107's unbounded `dropDuplicates` cannot do).
  */
class DropDuplicatesWatermarkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("duplicate inside the delay window drops; state evicts once " +
      "the watermark passes; a late re-arrival is re-emitted") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000000L // ms
    def ts(deltaS: Long) = new Timestamp(t0 + deltaS * 1000)

    val input = MemoryStream[(String, Timestamp)]
    val deduped = input.toDS().toDF("h", "ing_ts")
      .withWatermark("ing_ts", "10 seconds")
      .dropDuplicatesWithinWatermark("h")
    val name = s"wm_dedup_${System.nanoTime()}"
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      // batch 1: first sight of "a" → emitted; watermark after this
      // batch = t0 − 10 s
      input.addData(("a", ts(0)))
      q.processAllAvailable()
      // batch 2: exact duplicate of "a" while state is live → dropped;
      // "adv" at +300 s pushes the watermark to +290 s, far past
      // "a"'s expiry (event time + 10 s) → "a"'s state evicts
      input.addData(("a", ts(1)), ("adv", ts(300)))
      q.processAllAvailable()
      // batch 3: "a" re-arrives after eviction → emitted AGAIN
      input.addData(("a", ts(301)))
      q.processAllAvailable()

      val emitted = spark.table(name).collect()
        .map(_.getString(0)).toSeq
      assert(emitted.count(_ == "a") == 2,
        s"expected re-emission after state eviction, got $emitted")
      assert(emitted.count(_ == "adv") == 1)

      // the state store really shrank: after batch 3 only the keys
      // whose expiry is still ahead of the watermark remain
      val state = q.lastProgress.stateOperators
      assert(state.nonEmpty && state.head.numRowsTotal <= 2,
        s"state not bounded: ${state.map(_.numRowsTotal).toSeq}")
    } finally q.stop()
  }
}
