package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Banded interval (range) join — the batch analog of the streaming
  * interval join (q50) and the generic scale pattern for time-range
  * predicates (SURVEY.md §2.3 "range/as-of joins for the events tier").
  *
  * A naive `a.ts < b.ts AND b.ts <= a.ts + w` self-join has no equi key,
  * so Spark would plan a nested-loop / cartesian product — O(n²) and a
  * non-starter on an events table at 100 TB. The banded rewrite makes it
  * an equi-join: quantize time into bands of exactly the window width
  * `w`. A follower event `b` with `b.ts ∈ (a.ts, a.ts + w]` lands either
  * in a's band or the next one, so the LEADER side explodes to exactly
  * those two bands, the follower maps to its own single band, and the
  * join key becomes `(type, band)`. Every qualifying pair meets in
  * exactly one band (the follower's), so no post-join dedup is needed —
  * just the exact residual range filter. Cost: one 2× row expansion and
  * one keyed shuffle; survives any corpus size because band population
  * is bounded by event rate × window, not corpus size.
  *
  * Band arithmetic is integer µs (`div`), never double — a 2024 epoch in
  * µs (~1.7e18 ns / 1.7e15 µs) is far beyond a double's 2^53 exact
  * range, so a float division here would mis-band edge events.
  */
object Intervals {

  private val WindowUs: Long = 60L * 1000000L // 60 s follow-on window

  /** Core banded rewrite: all pairs (a_us, b_us) per key with
    * `b_us ∈ (a_us, a_us + windowUs]`, as an equi-join on (key, band).
    * `events` must have columns (key: String, us: Long). Exposed so the
    * spec can prove pair-for-pair equality with the naive O(n²) join.
    */
  def bandedPairs(events: DataFrame, windowUs: Long): DataFrame = {
    val leaders = events.select(col("key").as("t"), col("us").as("a_us"))
      .withColumn("band", explode(array(
        expr(s"a_us div ${windowUs}L"),
        expr(s"a_us div ${windowUs}L + 1L"))))
    val followers = events.select(col("key").as("t2"),
        col("us").as("b_us"))
      .withColumn("band2", expr(s"b_us div ${windowUs}L"))
    leaders
      .join(followers,
        col("t") === col("t2") && col("band") === col("band2"))
      .filter(col("b_us") > col("a_us") &&
        col("b_us") <= col("a_us") + windowUs)
      .select(col("t").as("key"), col("a_us"), col("b_us"))
  }

  /** Pairs (a, b) of same-type events with b.ts in (a.ts, a.ts + w],
    * per-type pair count and mean follow-on gap. The gap average is one
    * double division of exact integer sums (engine-stable).
    */
  val q78RangeJoin: QueryDef = QueryDef(
    "q78_range_join",
    (s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("event_type").as("key"),
          unix_micros(col("ts")).as("us"))
      bandedPairs(e, WindowUs)
        .groupBy(col("key").as("event_type"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("b_us") - col("a_us")).as("gap_us"))
        .select(col("event_type"), col("n_pairs"),
          graft.Round4((col("gap_us").cast(DoubleType) / col("n_pairs"))
            / lit(1000000d)).as("avg_gap_s"))
        .orderBy("event_type")
    },
    Some(s"""WITH e AS (
            |  SELECT event_type, CAST(ts AS TIMESTAMP) AS ts FROM events)
            |SELECT a.event_type,
            |  COUNT(*) AS n_pairs,
            |  ${graft.Round4.sql(
              "(CAST(SUM(epoch_us(b.ts) - epoch_us(a.ts)) AS DOUBLE)" +
                " / COUNT(*)) / 1000000")} AS avg_gap_s
            |FROM e a JOIN e b
            |  ON a.event_type = b.event_type
            | AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 60 SECOND
            |GROUP BY 1 ORDER BY a.event_type""".stripMargin),
    bench = true)

  val all: Seq[QueryDef] = Seq(q78RangeJoin)
}
