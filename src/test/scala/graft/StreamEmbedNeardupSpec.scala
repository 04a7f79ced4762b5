package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Drives q131's stream-static embedding near-dup from a MemoryStream
  * with the delta split across MICRO-BATCHES (the file-replay QueryDef
  * delivers one batch) — the embedding twin of
  * [[StreamIncrementalNeardupSpec]]. Claims under test: the stateless
  * in-row delta codes equal the batch signCodes bit-for-bit (else the
  * candidate sets diverge), batch boundaries are invisible to the
  * result, and the cross-batch pair-dedup state swallows redelivered
  * vectors.
  */
class StreamEmbedNeardupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("multi-batch delta delivery (with a redelivered vector) equals " +
      "the batch one-sided answer, with no duplicate pairs emitted") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val isDelta = col("vec_id") % 10 === 1
    val deltaRows = Tables.load(spark, dir, "embeddings")
      .filter(isDelta).select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    assert(deltaRows.length >= 2, "fixture too small for a 2-batch split")

    val input = MemoryStream[(Long, Array[Float])]
    val verified = operators.Similarity.streamOneSidedBanded(
      spark, dir, isDelta, input.toDS().toDF("vec_id", "embedding"))
    val name = s"emb_neardup_${System.nanoTime()}"
    val q = verified.writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      val (firstHalf, secondHalf) = deltaRows.splitAt(deltaRows.length / 2)
      input.addData(firstHalf.toSeq: _*)
      q.processAllAvailable()
      // second batch redelivers a first-batch vector — the pair-dedup
      // state must swallow the repeat across the batch boundary
      input.addData((secondHalf ++ firstHalf.take(1)).toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    val raw = spark.table(name)
    assert(raw.count() ==
      raw.select("base_id", "delta_id").distinct().count(),
      "redelivery emitted duplicate pairs — cross-batch dedup state " +
        "is broken")
    val batch = operators.Similarity.oneSidedBanded(spark, dir, isDelta)
    assert(raw.count() > 0, "no pairs found — vacuous test")
    assert(raw.count() == batch.count(),
      "raw streamed row count diverges from the batch answer")
    val streamed = raw.select("base_id", "delta_id", "sim")
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
    val isDelta = col("vec_id") % 10 === 1
    val deltaRows = Tables.load(spark, dir, "embeddings")
      .filter(isDelta).select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)

    val input = MemoryStream[(Long, Array[Float])]
    val verified = operators.Similarity.streamOneSidedBanded(
      spark, dir, isDelta, input.toDS().toDF("vec_id", "embedding"),
      pairDedupState = false)
    val name = s"emb_neardup_nc_${System.nanoTime()}"
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
