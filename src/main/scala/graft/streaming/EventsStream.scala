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

  /** Expose a single fixture file as a one-file stream directory (the
    * file-stream source requires a directory) via a /tmp symlink dir.
    * The dir name carries a murmur hash of the RAW fixture dir string,
    * not just its sanitized form — two distinct dirs whose
    * non-alphanumeric characters sanitize identically (e.g. `sf0.1` vs
    * `sf0_1`) must NOT share a stream directory, or one would silently
    * stream the other's fixture (ADVICE r10). An existing link is
    * validated to resolve to the expected target: a dangling link from
    * a deleted fixture, or a collision survivor, is replaced instead
    * of yielding an empty/wrong stream.
    */
  private def streamDirFor(tag: String, dir: String, file: String)
      : java.nio.file.Path = {
    import java.nio.file.{Files, Paths}
    val h = f"${scala.util.hashing.MurmurHash3.stringHash(dir)}%08x"
    val streamDir = Paths.get(
      s"/tmp/graft_stream_${tag}_" +
        s"${dir.replaceAll("[^A-Za-z0-9]", "_")}_$h")
    Files.createDirectories(streamDir)
    val link = streamDir.resolve(file)
    val target = Paths.get(s"$dir/$file").toAbsolutePath
    val stale = Files.isSymbolicLink(link) &&
      (Files.readSymbolicLink(link) != target || !Files.exists(target))
    // two sessions may both see the stale link — losing the delete
    // race is fine, the create below settles it
    if (stale)
      try Files.delete(link)
      catch { case _: java.nio.file.NoSuchFileException => () }
    if (!Files.exists(link, java.nio.file.LinkOption.NOFOLLOW_LINKS))
      // concurrent streaming queries (parallel Verify) may race here —
      // losing the race is fine, the link is identical (same target)
      try Files.createSymbolicLink(link, target)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
    streamDir
  }

  /** Streaming view of events.parquet with µs-normalized `ts`
    * (same normalization as Tables.load). The file-stream source requires
    * a directory, so the single fixture file is exposed through a temp
    * symlink directory.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val streamDir = streamDirFor("src", dir, "events.parquet")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val raw = spark.readStream.schema(schema).parquet(streamDir.toString)
    // Same ts normalization as Tables.load: raw-ns fixtures divide down
    // to µs; native timestamp[us] fixtures just relabel NTZ → session-UTC.
    if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw.withColumn("ts",
      col("ts").cast(org.apache.spark.sql.types.TimestampType))
  }

  /** Streaming view of the documents table — the text-corpus stream a
    * continuous-crawl pipeline consumes. Same symlink-directory +
    * explicit-schema contract as [[readEvents]] (no ns-timestamp
    * normalization needed; documents carry no event time).
    */
  def readDocuments(spark: SparkSession, dir: String): DataFrame = {
    val streamDir = streamDirFor("docs", dir, "documents.parquet")
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    spark.readStream.schema(schema).parquet(streamDir.toString)
  }

  /** Streaming view of the embeddings table — the vector stream a
    * continuous embedding-ingest pipeline consumes (q131). Same
    * symlink-directory + explicit-schema contract as [[readDocuments]].
    */
  def readEmbeddings(spark: SparkSession, dir: String): DataFrame = {
    val streamDir = streamDirFor("embs", dir, "embeddings.parquet")
    val schema = spark.read.parquet(s"$dir/embeddings.parquet").schema
    spark.readStream.schema(schema).parquet(streamDir.toString)
  }

  /** Streaming view of the committed chat-conversation fixture — the
    * conversation stream q194's ingest gate and q203's intake ledger
    * consume. Same symlink-directory + explicit-schema contract as
    * [[readPiiDocs]].
    */
  def readChatConvos(spark: SparkSession): DataFrame = {
    val path = java.nio.file.Paths.get(graft.Fixtures.chatConvosPath)
    val streamDir = streamDirFor("chat", path.getParent.toString,
      path.getFileName.toString)
    val schema = spark.read.parquet(graft.Fixtures.chatConvosPath).schema
    spark.readStream.schema(schema).parquet(streamDir.toString)
  }

  /** Streaming view of the committed crawl manifest — the URL stream
    * a continuous frontier (q182) consumes. Same symlink-directory +
    * explicit-schema contract as [[readPiiDocs]].
    */
  def readUrls(spark: SparkSession): DataFrame = {
    val path = java.nio.file.Paths.get(graft.Fixtures.urlCorpusPath)
    val streamDir = streamDirFor("urls", path.getParent.toString,
      path.getFileName.toString)
    val schema = spark.read.parquet(graft.Fixtures.urlCorpusPath).schema
    spark.readStream.schema(schema).parquet(streamDir.toString)
  }

  /** Streaming view of the committed near-dup VIDEO fixture — the
    * media-asset stream q206's continuous ingest dedup consumes. Same
    * symlink-directory + explicit-schema contract as [[readPiiDocs]].
    */
  def readNeardupVideo(spark: SparkSession): DataFrame = {
    val path = java.nio.file.Paths.get(graft.Fixtures.mediaNeardupVideoPath)
    val streamDir = streamDirFor("vidnd", path.getParent.toString,
      path.getFileName.toString)
    val schema =
      spark.read.parquet(graft.Fixtures.mediaNeardupVideoPath).schema
    spark.readStream.schema(schema).parquet(streamDir.toString)
  }

  /** Streaming view of the planted-PII fixture corpus — the document
    * stream q156's cleaning monitor consumes. Same symlink-directory +
    * explicit-schema contract as [[readDocuments]].
    */
  def readPiiDocs(spark: SparkSession): DataFrame = {
    val path = java.nio.file.Paths.get(graft.Fixtures.piiDocsPath)
    val streamDir = streamDirFor("pii", path.getParent.toString,
      path.getFileName.toString)
    val schema = spark.read.parquet(graft.Fixtures.piiDocsPath).schema
    spark.readStream.schema(schema).parquet(streamDir.toString)
  }

  /** Run a streaming aggregation to completion over the static fixture
    * and return the final result as a batch DataFrame.
    *
    * `requireSingleBatch` asserts all input rows arrived in ONE
    * micro-batch — for operators whose batch-equivalence oracle
    * silently depends on it (q90's greedy funnel fold is only equal to
    * the batch window formulation when no earlier event arrives in a
    * later batch; see [[FunnelTracker]]'s in-order contract). A
    * multi-file source that split delivery would pass the oracle only
    * by luck — this turns that luck into a loud failure.
    */
  def runToCompletion(spark: SparkSession, agg: DataFrame,
      mode: String = "complete",
      requireSingleBatch: Boolean = false): DataFrame = {
    val name = s"graft_stream_${nameCounter.incrementAndGet()}"
    val q = agg.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .start()
    try {
      q.processAllAvailable()
      if (requireSingleBatch) {
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        if (dataBatches > 1)
          throw new IllegalStateException(
            s"operator assumes single-batch delivery but data arrived " +
              s"in $dataBatches micro-batches — buffer/reorder via " +
              s"watermark before folding")
      }
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

  /** Watermarked session-window aggregation (30-min inactivity gap) —
    * the streaming form of q34's sessionization. Unlike fixed windows,
    * session state MERGES as events arrive: a late-but-in-watermark
    * event can bridge two open sessions into one, so the state store
    * holds per-key open-session ranges rather than fixed buckets, and
    * the watermark bounds how long a session can stay open (state
    * eviction — the unbounded-state guard at production scale). Same
    * output columns as the batch q34, which is the equivalence oracle.
    */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("total"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        col("n"), col("total"))

  /** Watermarked exactly-once-ish keyed dedup. */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(Seq("user_id", "event_type"))

  /** Stream-stream interval join: each click pairs with the same user's
    * purchases landing within the following `windowMinutes`. Both sides
    * carry watermarks and the join condition bounds event-time distance,
    * so Spark can expire join state — the property that keeps state
    * bounded on an unbounded stream (without the time bound, stream-
    * stream inner join state grows forever).
    */
  /** LEFT-OUTER stream-stream attribution — the q50 join completed to
    * the outer family: every click emits, matched rows immediately,
    * unmatched clicks as null-extended rows once the watermark passes
    * the click's match window (no future purchase can change the
    * outcome). That watermark-driven state expiry is what bounds the
    * join state at ingest scale: a click's row leaves the store the
    * moment it is decided, so state holds only the sliding
    * (delay + window) frontier — `StreamOuterJoinSpec` drives the
    * eviction across micro-batches and checks the store shrinks.
    */
  def clickToPurchaseOuter(events: DataFrame,
      windowMinutes: Int = 10): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"),
        col("event_id").as("purchase_id"), col("ts").as("p_ts"),
        col("value"))
      .withWatermark("p_ts", "10 minutes")
    clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr(s"interval $windowMinutes minutes"),
      "left_outer")
      .select(col("c_user").as("user_id"), col("click_id"), col("c_ts"),
        col("purchase_id"), col("value"))
  }

  def clickToPurchase(events: DataFrame,
      windowMinutes: Int = 10): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"),
        col("event_id").as("purchase_id"), col("ts").as("p_ts"),
        col("value"))
      .withWatermark("p_ts", "10 minutes")
    clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr(s"interval $windowMinutes minutes"))
      .select(col("c_user").as("user_id"), col("click_id"),
        col("purchase_id"), col("value"))
  }
}
