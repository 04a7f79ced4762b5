package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicInteger

/** Structured-Streaming tier over the events table (SURVEY.md §2.9).
  *
  * The reference is strictly batch (its "streaming" is row-at-a-time COPY,
  * reference `migrate.go:319-349`); this tier is the Spark-native
  * extension: file-stream source → event-time watermark → windowed /
  * keyed-dedup transforms → sink. `foreachBatch` reuses any batch writer,
  * which is how the COPY sink (graft.sources.CopySink) plugs into
  * streaming at production scale.
  *
  * For deterministic verification we drive the stream from the static
  * events parquet and drain it synchronously with processAllAvailable()
  * into an in-memory sink ("complete" mode), which must equal the batch
  * aggregation over the same file — that equivalence is the oracle.
  */
object EventsStream {
  private val nameCounter = new AtomicInteger(0)

  /** Streaming view of events.parquet with µs-normalized `ts`
    * (same normalization as Tables.load). The file-stream source requires
    * a directory, so the single fixture file is exposed through a temp
    * symlink directory.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val streamDir = Paths.get(
      s"/tmp/graft_stream_src_${dir.replaceAll("[^A-Za-z0-9]", "_")}")
    Files.createDirectories(streamDir)
    val link = streamDir.resolve("events.parquet")
    if (!Files.exists(link))
      Files.createSymbolicLink(link, Paths.get(s"$dir/events.parquet"))
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    spark.readStream.schema(schema).parquet(streamDir.toString)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Run a streaming aggregation to completion over the static fixture
    * and return the final result as a batch DataFrame.
    */
  def runToCompletion(spark: SparkSession, agg: DataFrame,
      mode: String = "complete"): DataFrame = {
    val name = s"graft_stream_${nameCounter.incrementAndGet()}"
    val q = agg.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .start()
    try {
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name)
  }

  /** Watermarked tumbling-window aggregation (1 h windows). */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("total"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_w"),
        col("event_type"), col("n"), col("total"))

  /** Watermarked exactly-once-ish keyed dedup. */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(Seq("user_id", "event_type"))
}
