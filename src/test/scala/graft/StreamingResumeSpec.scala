package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Checkpoint-resume contract for the streaming tier (SURVEY §2.9 /
  * the batch side's checkpoint+resume analog): a streaming aggregation
  * stopped mid-stream and restarted from its checkpointLocation must
  *
  *  - NOT reprocess the files its checkpoint already committed
  *    (exactly-once over the source),
  *  - resume its STATE, so post-restart emissions continue the running
  *    aggregate rather than starting from zero,
  *  - end at exactly the batch answer over all input.
  *
  * This is the property that lets a year-long ingest survive a driver
  * restart; the batch-migration side proves the same contract through
  * `CheckpointManager` (PipelineSpec resume tests).
  */
class StreamingResumeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("streaming agg restarted from its checkpoint skips committed " +
      "files, resumes state, and lands on the batch answer") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_resume")
    val in = root.resolve("in").toString
    val cp = root.resolve("cp").toString

    def writeFile(rows: Seq[(Long, String)]): Unit =
      rows.toDF("user_id", "event_type").repartition(1)
        .write.mode("append").parquet(in)

    // observed (batchId, user_id, count) rows across BOTH runs
    val seen = mutable.Buffer[(Long, Long, Long)]()
    val schema = new org.apache.spark.sql.types.StructType()
      .add("user_id", "long").add("event_type", "string")

    def startQuery() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .writeStream.outputMode("update")
      .option("checkpointLocation", cp)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val rows = batch.collect()
        seen.synchronized {
          seen ++= rows.map(r => (id, r.getLong(0), r.getLong(1)))
        }
        ()
      }
      .start()

    // run 1: two files committed, then a hard stop
    writeFile(Seq((1L, "view"), (2L, "view")))
    writeFile(Seq((1L, "click")))
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    val run1MaxBatch = seen.synchronized(seen.map(_._1).max)
    val run1Rows = seen.synchronized(seen.size)
    // state after run 1: user 1 -> 2, user 2 -> 1
    assert(seen.synchronized(seen.toSeq).collect {
      case (_, 1L, n) => n
    }.max == 2L)

    // run 2: two more files arrive while "down", restart from the SAME
    // checkpoint
    writeFile(Seq((1L, "purchase"), (3L, "view")))
    writeFile(Seq((2L, "click")))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val all = seen.synchronized(seen.toVector)

    // exactly-once over the source: run 2 did NOT re-emit run 1's
    // batches — its batch ids strictly continue the committed sequence
    val run2 = all.drop(run1Rows)
    assert(run2.nonEmpty)
    assert(run2.map(_._1).min > run1MaxBatch,
      s"restart replayed committed batches: $all")

    // state resumed: user 1's post-restart count continues from 2 -> 3
    // (a from-zero restart would emit 1)
    assert(run2.collect { case (_, 1L, n) => n }.max == 3L)

    // and the final per-user counts equal the batch answer over ALL
    // files (latest emission per user wins — update mode)
    val finalCounts = all.groupBy(_._2).view
      .mapValues(_.maxBy(_._1)._3).toMap
    val batchAnswer = spark.read.parquet(in)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(finalCounts == batchAnswer,
      s"streaming $finalCounts != batch $batchAnswer")
  }
}
