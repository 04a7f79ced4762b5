package graft.operators

import graft.{QueryDef, Round4, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Event-sequence analytics over the `events` table — the behavioral
  * OLAP tier (funnels, recency scoring, burst detection, distribution
  * profiling) that complements the time-join operators in
  * [[AsofJoin]]/[[Intervals]] (reference events tier: `events_agg.go`,
  * window semantics per SURVEY.md §2.8).
  *
  * All four queries share one scale posture: the ONLY wide operation is
  * a single hash exchange on `user_id` (funnel, burst) or on the small
  * group key (decay, histogram). Per-user sequence logic runs inside
  * one partition-local sort — never a self-join, never a collect — so
  * the plans are corpus-size-invariant: 1000 executors each sessionize
  * their own user shard.
  */
object EventAnalytics {

  private val StepUs: Long = 6L * 3600L * 1000000L // 6 h per funnel step

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))

  /** Ordered 3-step conversion funnel (view → click → purchase, each
    * step within 6 h of the previous one) in ONE shuffle.
    *
    * The textbook formulation is a chain of per-step self-joins (the
    * oracle SQL keeps that shape as the semantic spec). Joins re-shuffle
    * the full events relation once per step; at 100 TB that is three
    * fact-sized exchanges. Instead the step times are three chained
    * window minima over the SAME `partition by user_id` — Catalyst
    * plans one exchange + one sort and evaluates all three frames in
    * that single partition pass, because each successive window reuses
    * the child's partitioning. Per-user state is O(1) (three
    * timestamps), so no skew concern even for a bot user with 10^8
    * events.
    */
  val q83Funnel: QueryDef = QueryDef(
    "q83_funnel",
    (s, dir) => {
      val perUser = Window.partitionBy("user_id")
      val t1 = events(s, dir)
        .withColumn("t1",
          min(when(col("event_type") === "view", col("us"))).over(perUser))
      val t2 = t1.withColumn("t2",
        min(when(col("event_type") === "click" &&
            col("us") > col("t1") &&
            col("us") <= col("t1") + StepUs, col("us"))).over(perUser))
      val t3 = t2.withColumn("t3",
        min(when(col("event_type") === "purchase" &&
            col("us") > col("t2") &&
            col("us") <= col("t2") + StepUs, col("us"))).over(perUser))
      t3.groupBy("user_id")
        .agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3"))
        .agg(count(col("t1")).as("viewed"),
          count(col("t2")).as("clicked"),
          count(col("t3")).as("purchased"))
    },
    Some(s"""WITH e AS (
            |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
            |  FROM events),
            |s1 AS (SELECT user_id, MIN(ts) AS t1 FROM e
            |       WHERE event_type = 'view' GROUP BY 1),
            |s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM e
            |       JOIN s1 ON e.user_id = s1.user_id
            |       WHERE e.event_type = 'click' AND e.ts > s1.t1
            |         AND e.ts <= s1.t1 + INTERVAL 6 HOUR GROUP BY 1),
            |s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM e
            |       JOIN s2 ON e.user_id = s2.user_id
            |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2
            |         AND e.ts <= s2.t2 + INTERVAL 6 HOUR GROUP BY 1)
            |SELECT (SELECT COUNT(*) FROM s1) AS viewed,
            |       (SELECT COUNT(*) FROM s2) AS clicked,
            |       (SELECT COUNT(*) FROM s3) AS purchased""".stripMargin),
    bench = true, lowLatency = true)

  private val HalfLifeUs: Double = 7d * 86400d * 1000000d // 7-day half-life

  /** Recency-weighted score: sum(value · 2^(−age/half-life)) per event
    * type, age anchored at the corpus max timestamp.
    *
    * The anchor is a 1-row global aggregate joined back by cross join —
    * Spark broadcasts a single-row build side, so the fact scan is
    * never re-shuffled for it (the copy-safe idiom VERDICT r3 #8
    * mandated over an empty-partition window). The decay weight is
    * per-row codegen arithmetic; the only exchange is the final 5-key
    * aggregation.
    */
  val q84Decay: QueryDef = QueryDef(
    "q84_decay_score",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("event_type"), unix_micros(col("ts")).as("us"),
          col("value"))
        .join(Tables.load(s, dir, "events")
          .agg(max(unix_micros(col("ts"))).as("t_max")))
      ev.withColumn("w",
          pow(lit(2d), (col("us") - col("t_max")).cast(DoubleType)
            / lit(HalfLifeUs)))
        .groupBy("event_type")
        .agg(Round4(sum(col("value") * col("w"))).as("decayed_sum"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    },
    Some(s"""WITH e AS (
            |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
            |         value FROM events),
            |m AS (SELECT MAX(us) AS t_max FROM e)
            |SELECT event_type,
            |  ${Round4.sql("SUM(value * POW(2, CAST(us - t_max AS DOUBLE) / "
              + s"$HalfLifeUs))")} AS decayed_sum,
            |  COUNT(*) AS n
            |FROM e, m GROUP BY event_type ORDER BY event_type""".stripMargin))

  private val BurstUs: Long = 3600L * 1000000L // 1-hour trailing window

  /** Burst profile: events in the trailing 1 h per user (a RANGE window
    * frame over event-time µs — value-based, not row-based, so sparse
    * and dense users get the same semantics), summarized per type.
    *
    * Same single-exchange posture as the funnel: one hash partition by
    * user, one in-partition sort, frame state bounded by events/hour.
    * This is the batch twin of the streaming sliding window (q43) —
    * same window semantics, expressed as a frame instead of state.
    */
  val q85Burst: QueryDef = QueryDef(
    "q85_burst_window",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("us")
        .rangeBetween(-BurstUs, 0)
      events(s, dir)
        .withColumn("cnt_1h", count(lit(1)).over(w))
        .groupBy("event_type")
        .agg(max("cnt_1h").as("max_burst"),
          Round4(avg("cnt_1h")).as("avg_burst"))
        .orderBy("event_type")
    },
    Some(s"""WITH e AS (
            |  SELECT user_id, event_type,
            |         epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
            |w AS (
            |  SELECT event_type, COUNT(*) OVER (
            |    PARTITION BY user_id ORDER BY us
            |    RANGE BETWEEN ${BurstUs} PRECEDING AND CURRENT ROW)
            |    AS cnt_1h FROM e)
            |SELECT event_type, MAX(cnt_1h) AS max_burst,
            |  ${Round4.sql("AVG(cnt_1h)")} AS avg_burst
            |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin))

  private val BinWidth = 50d

  /** Fixed-width value histogram per event type — the distribution
    * profile a pipeline operator (or the q77 profiler) uses to pick
    * chunk bounds and detect drift. Bin assignment is per-row integer
    * arithmetic fused into the scan stage; the aggregate output is
    * (types × bins) rows regardless of corpus size, so the exchange
    * carries only partial-agg state — the canonical map-side-combine
    * shape.
    */
  val q86Histogram: QueryDef = QueryDef(
    "q86_value_histogram",
    (s, dir) => {
      Tables.load(s, dir, "events")
        .select(col("event_type"),
          floor(col("value") / BinWidth).cast("long").as("bin"),
          col("value"))
        .groupBy("event_type", "bin")
        .agg(count(lit(1)).as("n"), Round4(sum("value")).as("sum_value"))
        .orderBy("event_type", "bin")
    },
    Some(s"""SELECT event_type,
            |  CAST(FLOOR(value / $BinWidth) AS BIGINT) AS bin,
            |  COUNT(*) AS n, ${Round4.sql("SUM(value)")} AS sum_value
            |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Weekly cohort retention: users grouped by first-activity week,
    * counted distinctly in each later week they return. The classic
    * product-analytics triangle, and a deliberately join-shaped
    * contrast to the funnel: cohort assignment (per-user min) and the
    * distinct (user, week) activity relation both hash-partition on
    * user_id, so the cohort join co-partitions with no extra fact
    * shuffle; only the final (cohort, offset) aggregate — output
    * bounded by weeks², not corpus — re-keys. The week offset is
    * integer day arithmetic `div 7` on date_trunc'd dates (exact in
    * both engines; no epoch-float rounding).
    */
  val q89Retention: QueryDef = QueryDef(
    "q89_retention",
    (s, dir) => {
      val activity = Tables.load(s, dir, "events")
        .select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("week"))
        .distinct()
      val cohorts = activity.groupBy("user_id")
        .agg(min("week").as("cohort_week"))
      activity.join(cohorts, "user_id")
        .groupBy(col("cohort_week"),
          expr("datediff(week, cohort_week) div 7").as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_week", "week_offset")
    },
    Some("""WITH a AS (
           |  SELECT DISTINCT user_id,
           |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE)
           |      AS week
           |  FROM events),
           |c AS (SELECT user_id, MIN(week) AS cohort_week FROM a
           |      GROUP BY 1)
           |SELECT c.cohort_week,
           |  datediff('day', c.cohort_week, a.week) // 7 AS week_offset,
           |  COUNT(DISTINCT a.user_id) AS n_users
           |FROM a JOIN c ON a.user_id = c.user_id
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Hot-key diagnostic — the query an operator runs BEFORE deciding
    * to salt (q51/q52) or lean on AQE skew splitting: the 10 heaviest
    * join/agg keys with their share of the relation. One keyed
    * partial+final aggregate (the per-key count relation is the thing
    * being diagnosed, so it exists anyway), a broadcast 1-row total,
    * and a TakeOrdered top-10 — no global sort, output O(10) at any
    * corpus size.
    */
  val q94SkewProfile: QueryDef = QueryDef(
    "q94_skew_profile",
    (s, dir) => {
      val counts = Tables.load(s, dir, "events")
        .groupBy("user_id").agg(count(lit(1)).as("n"))
      counts
        .join(counts.agg(sum("n").as("total")))
        .select(col("user_id"), col("n"),
          Round4(col("n").cast(DoubleType) / col("total")).as("share"))
        .orderBy(col("n").desc, col("user_id"))
        .limit(10)
    },
    Some(s"""WITH c AS (SELECT user_id, COUNT(*) AS n FROM events
            |          GROUP BY 1),
            |t AS (SELECT SUM(n) AS total FROM c)
            |SELECT user_id, n,
            |  ${Round4.sql("CAST(n AS DOUBLE) / total")} AS share
            |FROM c, t ORDER BY n DESC, user_id LIMIT 10""".stripMargin))

  /** SCD type-2 interval construction from a change log — the
    * warehouse temporal-modeling primitive: collapse each user's event
    * stream into validity intervals [valid_from, valid_to) over the
    * tracked attribute (event_type), keeping only change points. Two
    * stacked windows (change detection via lag, interval close via
    * lead) over ONE (user_id, ts) sort — Catalyst plans a single
    * exchange + sort and evaluates both frames in that pass. The open
    * interval's valid_to is NULL, exactly the SCD-2 "current row"
    * convention. Timestamps travel as epoch µs so neither engine
    * formats time zones.
    */
  val q95Scd2: QueryDef = QueryDef(
    "q95_scd2",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("us")
      val changes = events(s, dir)
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      val wc = Window.partitionBy("user_id").orderBy("us")
      changes
        .withColumn("valid_to", lead(col("us"), 1).over(wc))
        .select(col("user_id"), col("event_type"),
          col("us").as("valid_from"), col("valid_to"))
        .orderBy("user_id", "valid_from")
    },
    Some("""WITH e AS (
           |  SELECT user_id, event_type,
           |         epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
           |c AS (
           |  SELECT user_id, event_type, us,
           |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY us)
           |      AS prev
           |  FROM e)
           |SELECT user_id, event_type, us AS valid_from,
           |  LEAD(us) OVER (PARTITION BY user_id ORDER BY us) AS valid_to
           |FROM c WHERE prev IS NULL OR prev <> event_type
           |ORDER BY user_id, valid_from""".stripMargin))

  private val MadK = 3.0

  /** Robust outlier accounting: events beyond `median ± 3·MAD` per
    * type — the data-quality rule that survives heavy tails where
    * mean/stddev break. Two median passes (median of values, then
    * median of absolute deviations) joined back by the 5-key group —
    * both joins broadcast group-cardinality relations, the fact table
    * shuffles once per pass. Both medians run through
    * [[Cutpoints.cutpointOf]]: exact `percentile` at this scale, the
    * sketch-banded exact arm (no per-group value buffer) at 100 TB —
    * bit-equal either way (CutpointSpec).
    */
  val q96Outliers: QueryDef = QueryDef(
    "q96_outliers",
    (s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("event_type"), col("value"))
      val med = Cutpoints.cutpointOf(
        e, Seq("event_type"), "value", Seq(0.5))
        .withColumnRenamed("cut0", "m")
      val dev = e.join(broadcast(med), "event_type")
        .withColumn("ad__", abs(col("value") - col("m")))
      val mad = Cutpoints.cutpointOf(
        dev, Seq("event_type"), "ad__", Seq(0.5))
        .withColumnRenamed("cut0", "mad")
        .join(med, "event_type")
      e.join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(abs(col("value") - col("m")) > col("mad") * MadK, 1L)
            .otherwise(0L)).as("n_outliers"),
          Round4(first(col("m"))).as("median"),
          Round4(first(col("mad"))).as("mad"))
        .orderBy("event_type")
    },
    Some(s"""WITH med AS (
            |  SELECT event_type, quantile_cont(value, 0.5) AS m
            |  FROM events GROUP BY 1),
            |mad AS (
            |  SELECT e.event_type,
            |    quantile_cont(abs(e.value - med.m), 0.5) AS mad,
            |    ANY_VALUE(med.m) AS m
            |  FROM events e JOIN med USING (event_type) GROUP BY 1)
            |SELECT e.event_type, COUNT(*) AS n,
            |  CAST(SUM(CASE WHEN abs(e.value - mad.m) > $MadK * mad.mad
            |       THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
            |  ${Round4.sql("ANY_VALUE(mad.m)")} AS median,
            |  ${Round4.sql("ANY_VALUE(mad.mad)")} AS mad
            |FROM events e JOIN mad USING (event_type)
            |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Statistical aggregate family — Pearson correlation, regression
    * slope, and sample stddev of value against event time per type
    * (drift detection: a nonzero slope means the metric trends inside
    * the window). All three are single-pass mergeable aggregates
    * (partial moment sums per map task, one 5-key exchange) — the same
    * map-side-combine shape as COUNT/SUM, just with higher moments.
    * The slope is rescaled from per-µs to per-hour so the 4-dp
    * rounding gate sees a stable magnitude.
    */
  val q97StatsAgg: QueryDef = QueryDef(
    "q97_stats_agg",
    (s, dir) => {
      Tables.load(s, dir, "events")
        .select(col("event_type"), col("value"),
          unix_micros(col("ts")).cast(DoubleType).as("us"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          Round4(corr(col("value"), col("us"))).as("corr_vt"),
          Round4(expr("regr_slope(value, us)") * lit(3600e6))
            .as("slope_per_hour"),
          Round4(stddev_samp(col("value"))).as("sd"))
        .orderBy("event_type")
    },
    Some(s"""WITH e AS (
            |  SELECT event_type, value,
            |    CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS DOUBLE) AS us
            |  FROM events)
            |SELECT event_type, COUNT(*) AS n,
            |  ${Round4.sql("corr(value, us)")} AS corr_vt,
            |  ${Round4.sql("regr_slope(value, us) * 3600e6")}
            |    AS slope_per_hour,
            |  ${Round4.sql("stddev_samp(value)")} AS sd
            |FROM e GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Funnel timing — how long conversion takes, not just whether it
    * happens: for users completing q83's view→click→purchase funnel,
    * the end-to-end seconds from first view to qualifying purchase.
    * Reuses the q83 single-exchange window chain verbatim and adds one
    * global aggregate over the ≤1-row-per-user relation; converter
    * counts stay consistent with q83 by construction.
    */
  val q101FunnelTiming: QueryDef = QueryDef(
    "q101_funnel_timing",
    (s, dir) => {
      val perUser = Window.partitionBy("user_id")
      val t1 = events(s, dir)
        .withColumn("t1",
          min(when(col("event_type") === "view", col("us"))).over(perUser))
      val t2 = t1.withColumn("t2",
        min(when(col("event_type") === "click" &&
            col("us") > col("t1") &&
            col("us") <= col("t1") + StepUs, col("us"))).over(perUser))
      val t3 = t2.withColumn("t3",
        min(when(col("event_type") === "purchase" &&
            col("us") > col("t2") &&
            col("us") <= col("t2") + StepUs, col("us"))).over(perUser))
      t3.groupBy("user_id")
        .agg(max("t1").as("t1"), max("t3").as("t3"))
        .filter(col("t3").isNotNull)
        .agg(count(lit(1)).as("converted"),
          Round4(avg((col("t3") - col("t1")).cast(DoubleType)
            / lit(1000000d))).as("avg_seconds"),
          Round4(expr(
            "percentile(CAST(t3 - t1 AS DOUBLE) / 1000000, 0.5D)"))
            .as("median_seconds"))
    },
    Some(s"""WITH e AS (
            |  SELECT user_id, event_type,
            |         epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
            |s1 AS (SELECT user_id, MIN(us) AS t1 FROM e
            |       WHERE event_type = 'view' GROUP BY 1),
            |s2 AS (SELECT e.user_id, MIN(e.us) AS t2 FROM e
            |       JOIN s1 ON e.user_id = s1.user_id
            |       WHERE e.event_type = 'click' AND e.us > s1.t1
            |         AND e.us <= s1.t1 + ${StepUs}
            |       GROUP BY 1),
            |s3 AS (SELECT e.user_id, MIN(e.us) AS t3 FROM e
            |       JOIN s2 ON e.user_id = s2.user_id
            |       WHERE e.event_type = 'purchase' AND e.us > s2.t2
            |         AND e.us <= s2.t2 + ${StepUs}
            |       GROUP BY 1)
            |SELECT COUNT(*) AS converted,
            |  ${Round4.sql("AVG(CAST(s3.t3 - s1.t1 AS DOUBLE) / 1000000)")}
            |    AS avg_seconds,
            |  ${Round4.sql("quantile_cont(CAST(s3.t3 - s1.t1 AS DOUBLE)" +
              " / 1000000, 0.5)")} AS median_seconds
            |FROM s3 JOIN s1 ON s3.user_id = s1.user_id""".stripMargin))

  /** Event-type co-occurrence (market-basket lite): for each unordered
    * type pair, how many users exhibit both, as absolute support and a
    * share of all users. The pair join runs on the DISTINCT
    * (user, type) relation — bounded by users × types, tiny next to
    * the event log — and co-partitions on user_id, so the only
    * fact-sized work is the initial distinct. Association/affinity
    * mining's candidate-generation shape.
    */
  val q102Cooccurrence: QueryDef = QueryDef(
    "q102_cooccurrence",
    (s, dir) => {
      val d = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type")).distinct()
      // user total joins as a broadcast 1-row aggregate — never a
      // driver-side action (the q62 copy-safe idiom)
      val users = d.agg(countDistinct(col("user_id")).as("nu"))
      val a = d.select(col("user_id"), col("event_type").as("t1"))
      val b = d.select(col("user_id"), col("event_type").as("t2"))
      a.join(b, Seq("user_id")).filter(col("t1") < col("t2"))
        .groupBy(col("t1"), col("t2"))
        .agg(count(lit(1)).as("n_users"))
        .join(broadcast(users))
        .withColumn("support",
          Round4(col("n_users").cast(DoubleType) / col("nu")))
        .select(col("t1"), col("t2"), col("n_users"), col("support"))
        .orderBy("t1", "t2")
    },
    Some(s"""WITH d AS (
            |  SELECT DISTINCT user_id, event_type FROM events),
            |u AS (SELECT COUNT(DISTINCT user_id) AS nu FROM d)
            |SELECT a.event_type AS t1, b.event_type AS t2,
            |  COUNT(*) AS n_users,
            |  ${Round4.sql("CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(u.nu)")}
            |    AS support
            |FROM d a JOIN d b ON a.user_id = b.user_id
            |  AND a.event_type < b.event_type
            |CROSS JOIN u
            |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** User-growth curve: first-seen date per user → daily new-user
    * counts → cumulative total. "Cumulative distinct" without any
    * distinct-over-window (which no engine supports): first-seen
    * assignment is one keyed aggregate, and the running sum then
    * operates on the POST-AGGREGATION days-cardinality relation — ≤ a
    * few thousand rows for a decade of data — where a single ordered
    * window partition is the right plan at any corpus size (the fact
    * table never enters a global window).
    */
  val q104Growth: QueryDef = QueryDef(
    "q104_growth",
    (s, dir) => {
      val firstSeen = Tables.load(s, dir, "events")
        .select(col("user_id"), col("ts").cast("date").as("d"))
        .groupBy("user_id").agg(min("d").as("d"))
      val daily = firstSeen.groupBy("d")
        .agg(count(lit(1)).as("new_users"))
      val w = Window.orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.withColumn("cum_users", sum("new_users").over(w))
        .orderBy("d")
    },
    Some("""WITH f AS (
           |  SELECT user_id,
           |    MIN(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d
           |  FROM events GROUP BY 1),
           |n AS (SELECT d, COUNT(*) AS new_users FROM f GROUP BY 1)
           |SELECT d, new_users,
           |  CAST(SUM(new_users) OVER (ORDER BY d
           |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
           |FROM n ORDER BY d""".stripMargin))

  /** Timeliness/completeness audit against a generated calendar spine:
    * every day between the corpus bounds, its event count, and a gap
    * flag — the data-quality check that catches silently missing
    * ingest days (a plain GROUP BY cannot report a day that has no
    * rows at all). The spine generates from a 1-row bounds aggregate
    * (days-cardinality, broadcast); daily counts are one keyed agg of
    * the fact table.
    */
  val q105GapDetection: QueryDef = QueryDef(
    "q105_gap_detection",
    (s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("ts").cast("date").as("d"))
      val bounds = e.agg(min("d").as("lo"), max("d").as("hi"))
      val spine = bounds.select(explode(
        expr("sequence(lo, hi, interval 1 day)")).as("d"))
      val daily = e.groupBy("d").agg(count(lit(1)).as("n"))
      spine.join(daily, Seq("d"), "left_outer")
        .select(col("d"), coalesce(col("n"), lit(0L)).as("n"),
          when(col("n").isNull, 1).otherwise(0).as("is_gap"))
        .orderBy("d")
    },
    Some("""WITH b AS (
           |  SELECT MIN(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS lo,
           |         MAX(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS hi
           |  FROM events),
           |spine AS (
           |  SELECT CAST(unnest(generate_series(b.lo, b.hi,
           |    INTERVAL 1 DAY)) AS DATE) AS d FROM b),
           |daily AS (
           |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
           |         COUNT(*) AS n
           |  FROM events GROUP BY 1)
           |SELECT spine.d, COALESCE(daily.n, 0) AS n,
           |  CASE WHEN daily.n IS NULL THEN 1 ELSE 0 END AS is_gap
           |FROM spine LEFT JOIN daily ON spine.d = daily.d
           |ORDER BY spine.d""".stripMargin))

  // Sketch-once-answer-many: per-day HLL sketches of the user set,
  // rolled up to 7-day distinct-user counts by UNIONING sketches —
  // the fact table is touched in ONE pass and every rolling answer
  // (and any future ad-hoc range: month, arbitrary [a, b]) derives
  // from day-sketch merges. This is the mergeable-summaries dashboard
  // pattern (Agarwal et al. PODS'12; the DataSketches HLL that Spark
  // ships): COUNT(DISTINCT) does not decompose over overlapping
  // windows, but sketch union does, exactly — so at 100 TB the
  // per-day sketch relation (KBs per day) replaces re-scanning a
  // week of facts per dashboard tile. The day×day range join runs on
  // the DAY DIMENSION (≤ corpus days squared, trivial at any scale).
  // The exact arm exists to GATE the estimate (q44's discipline): the
  // output carries exact rolling counts both engines compute, plus an
  // in-query ≤5% assertion on the HLL estimate — at 100 TB the exact
  // arm is the validation run, not the dashboard path.
  val q142SketchReuse: QueryDef = QueryDef(
    "q142_sketch_reuse",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(to_date(col("ts")).as("day"), col("user_id"))
      // the ONE fact pass: per-day sketches (persisted — both the
      // rolling union and the day spine read it)
      val daily = graft.Caches.persist(ev.groupBy(col("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk")))
      val days = daily.select(col("day"))
      val est = days
        .join(daily.select(col("day").as("d2"), col("sk")),
          col("d2").between(date_sub(col("day"), 6), col("day")))
        .groupBy(col("day"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"),
          count(lit(1)).as("days_in_window"))
      // exact arm: distinct (day, user) pairs joined to the day spine
      val du = ev.distinct()
      val exact = days
        .join(du.withColumnRenamed("day", "d2"),
          col("d2").between(date_sub(col("day"), 6), col("day")))
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("exact_rolling"))
      est.join(exact, "day")
        .select(col("day"), col("exact_rolling"),
          col("days_in_window"),
          (abs(col("est") - col("exact_rolling")).cast("double") /
            col("exact_rolling") <= 0.05).as("sketch_ok"))
        .orderBy("day")
    },
    Some("""WITH ev AS (
           |  SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
           |    user_id
           |  FROM events),
           |days AS (SELECT DISTINCT day FROM ev)
           |SELECT d.day, COUNT(DISTINCT e.user_id) AS exact_rolling,
           |  CAST(COUNT(DISTINCT e.day) AS BIGINT) AS days_in_window,
           |  true AS sketch_ok
           |FROM days d JOIN ev e ON e.day BETWEEN d.day - 6 AND d.day
           |GROUP BY d.day ORDER BY d.day""".stripMargin))

  val all: Seq[QueryDef] = Seq(q83Funnel, q84Decay, q85Burst, q86Histogram,
    q89Retention, q94SkewProfile, q95Scd2, q96Outliers, q97StatsAgg,
    q101FunnelTiming, q102Cooccurrence, q104Growth, q105GapDetection,
    q142SketchReuse)
}
