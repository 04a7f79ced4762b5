package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (temporal) join — an events-tier operator the reference lacks
  * (SURVEY.md §2.3 "range/as-of joins for the events tier").
  *
  * Spark-first implementation per the custom-operator ladder, step (a):
  * COMPOSE built-ins rather than a custom SparkPlan. The classic
  * union-sort trick makes it one shuffle + one per-key sort:
  * tag both sides, union, window-sort by (key, time, side-tag), and take
  * `last(right_value, ignoreNulls)` over the preceding frame. That is
  * exactly the merge-scan an AsOfJoinExec would do, but it reuses
  * Spark's shuffle/sort machinery, AQE, and codegen for free — and
  * scales to any key cardinality without a broadcast.
  *
  * Determinism: the right side is first reduced to one row per
  * (key, time) (max value), so ties are unambiguous in both engines;
  * at equal timestamps the right row sorts first (tag 0 < 1), matching
  * ASOF's inclusive `left.time >= right.time` semantics.
  */
object AsofJoin {

  /** Generic as-of: for each left row, the latest right `valueCol` with
    * rightTime <= leftTime on the same key. Output: left columns +
    * `asofValue`.
    */
  def asofLatest(
      left: DataFrame, leftKey: String, leftTimeMs: String,
      right: DataFrame, rightKey: String, rightTimeMs: String,
      valueCol: String): DataFrame = {
    val r1 = right.groupBy(col(rightKey).as("__k"),
        col(rightTimeMs).as("__t"))
      .agg(max(col(valueCol)).as("__v"))
      .withColumn("__tag", lit(0))
    val leftCols = left.columns
    val l1 = left.select(
      (col(leftKey).as("__k") +: col(leftTimeMs).as("__t") +:
        lit(null).cast(r1.schema("__v").dataType).as("__v") +:
        lit(1).as("__tag") +: leftCols.map(col)): _*)
    val rCols = Seq(col("__k"), col("__t"), col("__v"), col("__tag")) ++
      leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))
    val unioned = l1.unionByName(r1.select(rCols: _*))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("asofValue", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select((leftCols.map(col) :+ col("asofValue")): _*)
  }

  // Each event matched to the customer's latest order at-or-before the
  // event time. Oracle: DuckDB's native ASOF LEFT JOIN over the same
  // tie-deduplicated order set.
  val q37Asof: QueryDef = QueryDef(
    "q37_asof_join",
    (s, dir) => {
      val e = Tables.load(s, dir, "events")
        .withColumn("ms", unix_millis(col("ts")))
      val o = Tables.load(s, dir, "orders")
        .withColumn("oms", unix_millis(col("o_orderdate")
          .cast(org.apache.spark.sql.types.TimestampType)))
      asofLatest(
        e.select("event_id", "user_id", "ms"), "user_id", "ms",
        o.select("o_custkey", "oms", "o_orderkey"), "o_custkey", "oms",
        "o_orderkey")
        .select(col("event_id"), col("asofValue").as("last_order"))
        .orderBy("event_id")
    },
    Some("""WITH o AS (
           |  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
           |  FROM orders GROUP BY o_custkey, o_orderdate)
           |SELECT e.event_id, o.o_orderkey AS last_order
           |FROM events e
           |ASOF LEFT JOIN o
           |  ON e.user_id = o.o_custkey
           | AND CAST(e.ts AS TIMESTAMP) >= o.o_orderdate
           |ORDER BY e.event_id""".stripMargin),
    bench = true)

  val all: Seq[QueryDef] = Seq(q37Asof)
}
