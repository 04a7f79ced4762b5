package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Parquet fixture catalog (see TESTDATA.md / FIXTURES.md §2).
  *
  * Mirrors the reference's introspected-schema universe
  * (reference `model.go:46-58`): a named set of tables with fixed schemas.
  * Here the source is the driver-generated parquet star schema; the JDBC
  * dialect layer in [[graft.sources]] covers the reference's live-DB scans.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Global (dir, table) → parquet schema cache: repeated `load` calls
    * skip schema inference (open + footer parse) by passing the cached
    * schema to the reader — the role catalog table resolution plays on
    * a real cluster. Values are plain StructTypes with no session or
    * plan references, so nothing pins a stopped session. The cache key
    * carries the file's size + mtime, so a fixture regenerated with a
    * different physical encoding mid-process (the driver has re-written
    * events.parquet's ts type across rounds) re-infers instead of
    * reading through a stale schema.
    */
  private val schemaCache = scala.collection.concurrent.TrieMap
    .empty[(String, String, Long, Long),
      org.apache.spark.sql.types.StructType]

  private def cacheKey(dir: String, name: String): (String, String,
      Long, Long) = {
    val p = java.nio.file.Paths.get(s"$dir/$name.parquet")
    val (sz, mt) =
      try (java.nio.file.Files.size(p),
        java.nio.file.Files.getLastModifiedTime(p).toMillis)
      catch { case _: java.io.IOException => (-1L, -1L) }
    (dir, name, sz, mt)
  }

  /** Load one fixture table, normalizing `events.ts` to µs
    * session-zone TimestampType whatever the fixture's physical
    * encoding (the driver has regenerated it across rounds):
    *
    *  - nanosecond-precision parquet (Spark 4 rejects it with
    *    [PARQUET_TYPE_ILLEGAL]) — read as raw ns longs
    *    (legacy.parquet.nanosAsLong) and truncate to µs with integer
    *    division (a double division would lose precision on ~1.7e18 ns
    *    epoch values); DuckDB's CAST(ts AS TIMESTAMP) truncates ns→µs
    *    the same way;
    *  - native timestamp[us] (isAdjustedToUTC=false reads as
    *    TIMESTAMP_NTZ) — a plain cast to TimestampType, which under the
    *    session's forced UTC zone relabels the same µs instant DuckDB
    *    sees, no arithmetic.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val key = cacheKey(dir, name)
    dfCache.getOrElseUpdate((spark, key), {
      if (name == "events")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val path = s"$dir/$name.parquet"
      val schema = schemaCache.getOrElseUpdate(key,
        spark.read.parquet(path).schema)
      val raw = spark.read.schema(schema).parquet(path)
      if (name == "events") {
        val tsIsRawNanos = schema("ts").dataType ==
          org.apache.spark.sql.types.LongType
        if (tsIsRawNanos)
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        else raw.withColumn("ts", col("ts").cast(TimestampType))
      } else raw
    })
  }

  /** The resolved per-table DataFrame, cached per (session, file
    * identity): repeated query builds reuse one analyzed source
    * relation (and its file listing) instead of re-resolving the scan
    * on every build — the catalog-resolution cache a real cluster's
    * metastore provides, and a measurable slice of the unprepared-warm
    * planning cost. Dropped per session from [[Caches.clear]] so ended
    * sessions aren't pinned.
    */
  private val dfCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, (String, String, Long, Long)), DataFrame]

  /** Same resolved-relation cache for an arbitrary single parquet file
    * (the committed `fixtures/` reads) — see [[Fixtures.read]].
    */
  private[graft] def readCached(spark: SparkSession,
      path: String): DataFrame = {
    val p = java.nio.file.Paths.get(path)
    val (sz, mt) =
      try (java.nio.file.Files.size(p),
        java.nio.file.Files.getLastModifiedTime(p).toMillis)
      catch { case _: java.io.IOException => (-1L, -1L) }
    dfCache.getOrElseUpdate((spark, (path, "", sz, mt)),
      spark.read.parquet(path))
  }

  private[graft] def dropSession(spark: SparkSession): Unit =
    dfCache.keysIterator.foreach { k =>
      if (k._1 eq spark) dfCache.remove(k)
    }
}

/** One engine query: Spark builder + optional DuckDB oracle SQL.
  *
  * The oracle SQL must produce the same column NAMES (driver sorts columns
  * by name before hashing) and a deterministic total row order.
  * `bench = true` marks headline queries timed by [[Bench]].
  *
  * `lowLatency = true` marks queries that run under the engine's
  * interactive profile (AQE materialization barriers off — each AQE query
  * stage is a separate scheduler job costing a measured ~20-45 ms on this
  * host, which dominates sub-second queries; the adaptive profile stays
  * the default for the heavy/skew-prone tier and for every correctness
  * run). Plans must be correct under BOTH profiles — the flag only trades
  * runtime re-planning for scheduling floor.
  */
/** Engine-neutral 4-dp rounding: floor(x*10^4 + 0.5)/10^4 as identical
  * IEEE double ops in Spark and DuckDB. Engine round() builtins disagree
  * on near-tie doubles (HALF_UP on exact binary vs scaled-multiply), so
  * oracle queries use this form on BOTH sides.
  */
object Round4 {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.floor
  def apply(c: Column): Column = floor(c * 10000d + 0.5d) / 10000d
  val sql: String => String = x => s"floor(($x) * 10000 + 0.5) / 10000"
}

final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false,
    lowLatency: Boolean = false)
