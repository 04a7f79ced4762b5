package graft

import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Drives q127's stream-static incremental near-dup from a
  * MemoryStream with the delta split across MICRO-BATCHES — the
  * delivery shape the file-replay QueryDef (single batch) cannot
  * exercise. The claim under test: batch boundaries are invisible to
  * the result. Each delta doc's candidates come from a stream-static
  * join against the fixed base, and the pair-level dropDuplicates
  * state spans batches, so splitting or duplicating delivery must
  * yield exactly the batch q74-style answer on the same corpus.
  */
class StreamIncrementalNeardupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("multi-batch delta delivery (with a redelivered doc) equals " +
      "the single-shot batch answer") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val isDelta = col("doc_id") % 100 >= 90
    val base = docs.filter(!isDelta)
    val deltaRows = docs.filter(isDelta)
      .as[(Long, String)].collect().sortBy(_._1)
    assert(deltaRows.length >= 2, "fixture too small for a 2-batch split")

    val input = MemoryStream[(Long, String)]
    val verified = Dedup.streamIncrementalNeardup(
      base, input.toDS().toDF("doc_id", "text"))
    val name = s"inc_neardup_${System.nanoTime()}"
    val q = verified.writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      val (firstHalf, secondHalf) = deltaRows.splitAt(deltaRows.length / 2)
      input.addData(firstHalf.toSeq: _*)
      q.processAllAvailable()
      // second batch redelivers one doc from the first — the pair
      // dedup state must swallow the repeat across the batch boundary
      input.addData((secondHalf ++ firstHalf.take(1)).toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    // the RAW emitted table must already be duplicate-free: the
    // redelivered doc's pairs may only appear once, so a broken
    // cross-batch dropDuplicates state shows up as a count mismatch
    // here — no collapsing groupBy may hide it
    val raw = spark.table(name)
    assert(raw.count() ==
      raw.select("base_id", "delta_id").distinct().count(),
      "redelivered batch emitted duplicate pairs — cross-batch " +
        "dedup state is broken")
    val streamed = raw
      .groupBy("base_id", "delta_id").agg(first(col("jac")).as("jac"))

    val batch = Dedup.streamIncrementalNeardup(base, deltaRows.toSeq
      .toDF("doc_id", "text"))
    assert(streamed.count() > 0, "no cross-split pairs — vacuous test")
    assert(raw.count() == batch.count(),
      "raw streamed row count diverges from the batch answer")
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty,
      "streamed multi-batch result diverges from the batch answer")
    Caches.clear(spark)
  }

  test("NEGATIVE CONTROL: with the cross-batch pair-dedup state " +
      "disabled, redelivery emits duplicate pairs — the raw-count " +
      "guard above is live, not vacuous") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val isDelta = col("doc_id") % 100 >= 90
    val base = docs.filter(!isDelta)
    val deltaRows = docs.filter(isDelta)
      .as[(Long, String)].collect().sortBy(_._1)

    val input = MemoryStream[(Long, String)]
    val verified = Dedup.streamIncrementalNeardup(
      base, input.toDS().toDF("doc_id", "text"), pairDedupState = false)
    val name = s"inc_neardup_nc_${System.nanoTime()}"
    val q = verified.writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      input.addData(deltaRows.toSeq: _*)
      q.processAllAvailable()
      // redeliver the ENTIRE delta: without state every pair re-emits
      input.addData(deltaRows.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val raw = spark.table(name)
    val distinctPairs =
      raw.select("base_id", "delta_id").distinct().count()
    assert(raw.count() > distinctPairs,
      "dedup-state-off control emitted NO duplicates — the positive " +
        "test's raw-count assertion could never fail")
    Caches.clear(spark)
  }
}
