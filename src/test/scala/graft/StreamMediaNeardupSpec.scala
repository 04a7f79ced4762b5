package graft

import graft.operators.{MediaAsset, Multimodal}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Drives q206's stream-static media near-dup from a MemoryStream with
  * the delta clips split across MICRO-BATCHES and one clip redelivered
  * — the delivery shape the file-replay QueryDef (single batch) cannot
  * exercise. The claim under test: batch boundaries and redelivery are
  * invisible to the result (per-batch decode is stateless; the
  * pair-level dropDuplicates state spans batches).
  */
class StreamMediaNeardupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("multi-batch delta delivery (with a redelivered clip) equals " +
      "the committed-fingerprint batch answer") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = Fixtures.read(spark, Fixtures.mediaNeardupVideoPath)
      .select(col("vid_id"), col("fp"), col("payload"))
      .collect()
      .map(r => (r.getAs[Long]("vid_id"), r.getAs[Long]("fp"),
        r.getAs[Array[Byte]]("payload")))
    val base = all.filter(_._1 % 2 == 0)
    val delta = all.filter(_._1 % 2 == 1).sortBy(_._1)
    assert(delta.length >= 2)

    val baseDf = base.toSeq.map(r => (r._1, r._2)).toDF("vid_id", "fp")
    val input = MemoryStream[(Long, Array[Byte])]
    val pairs = Multimodal.streamMediaNeardup(baseDf,
      input.toDS().toDF("vid_id", "payload")
        .select(col("vid_id").as("doc_id"),
          lit("gif").as("media_type"), col("payload"))
        .as[MediaAsset])
    val name = s"media_neardup_${System.nanoTime()}"
    val q = pairs.writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      val (h1, h2) = delta.splitAt(delta.length / 2)
      input.addData(h1.map(r => (r._1, r._3)).toSeq: _*)
      q.processAllAvailable()
      // redeliver one clip from batch 1 alongside batch 2 — its pairs
      // must be swallowed by the cross-batch dropDuplicates state
      input.addData((h2 ++ h1.take(1)).map(r => (r._1, r._3)).toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    val raw = spark.table(name)
    assert(raw.count() ==
      raw.select("base_id", "delta_id").distinct().count(),
      "redelivery emitted duplicate pairs — cross-batch state broken")
    val streamed = raw.collect()
      .map(r => (r.getAs[Long]("base_id"), r.getAs[Long]("delta_id"),
        r.getAs[Int]("dist"))).toSet
    // reference: brute force over the COMMITTED fingerprints
    val expected = (for {
      (b, bf, _) <- base; (d, df, _) <- delta
      dist = java.lang.Long.bitCount(bf ^ df) if dist <= 10
    } yield (b, d, dist)).toSet
    assert(expected.nonEmpty, "no cross-parity pairs — test is vacuous")
    assert(streamed == expected,
      s"streamed ${streamed.size} pairs vs expected ${expected.size}")
    Caches.clear(spark)
  }
}
