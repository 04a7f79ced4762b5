package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §7.3 "chunk planning must handle
  * skewed key ranges"; the 100 TB posture for hot-key joins).
  *
  * AQE's skew-join handles sort-merge skew automatically at runtime;
  * salting is the explicit-plan fallback for aggregations and joins where
  * a handful of keys dominate (the classic hot-user/hot-token problem in
  * the events/dedup tiers).
  */
object Skew {

  /** Salted equi-join: the skewed (large) side gets a deterministic salt
    * in [0, salts) derived from its other columns; the small side is
    * replicated `salts` times. Result equals the plain inner join on
    * `key`, but hot keys spread across `salts` reducers.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val nonKey = skewed.columns.filter(_ != key)
    // deterministic salt from the row's full content (not rand(): keeps
    // retries/speculative tasks consistent)
    val saltExpr = pmod(xxhash64(skewed.columns.map(col): _*),
      lit(salts)).cast("int")
    val l = skewed.withColumn("__salt", saltExpr)
    val r = other.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (partial + final) skew-tolerant aggregation: count rows
    * per key by first aggregating per (key, salt), then summing partials.
    * Spark's hash aggregate already does map-side partials; this shape is
    * for the cases where a single reducer key still overflows (extreme
    * cardinality skew) — the salt splits the reduce side too.
    */
  def saltedCount(df: DataFrame, key: String, salts: Int): DataFrame = {
    val salt = pmod(xxhash64(df.columns.map(col): _*), lit(salts))
    df.withColumn("__salt", salt)
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("cnt"))
  }

  // Salted two-phase aggregation over the heaviest key domain in the
  // fixture (5 event types × thousands of rows each). The oracle is the
  // PLAIN group-by — salting must be invisible in the result.
  val q51SkewAgg: QueryDef = QueryDef(
    "q51_skew_salted_agg",
    (s, dir) =>
      saltedCount(Tables.load(s, dir, "events")
          .select("event_type", "event_id"),
        "event_type", salts = 8)
        .select(col("event_type"), col("cnt").cast("long").as("cnt"))
        .orderBy("event_type"),
    Some("""SELECT event_type, COUNT(*) AS cnt
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  // Salted equi-join of the skewed fact (events) against a replicated
  // dimension (customer), aggregated per market segment; again the
  // oracle is the unsalted join.
  val q52SkewJoin: QueryDef = QueryDef(
    "q52_skew_salted_join",
    (s, dir) => {
      val e = Tables.load(s, dir, "events")
        .filter(col("user_id").isNotNull)
        .select("event_id", "user_id")
      val c = Tables.load(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      saltedJoin(e, c, "user_id", salts = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment, COUNT(*) AS n
           |FROM events JOIN customer ON user_id = c_custkey
           |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))

  val all: Seq[QueryDef] = Seq(q51SkewAgg, q52SkewJoin)
}
