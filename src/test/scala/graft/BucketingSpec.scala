package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join (the SURVEY partitioning story): two tables
  * bucketed on the join key join WITHOUT a shuffle exchange — the
  * pre-partitioning replaces the runtime repartition, which at 100 TB is
  * the difference between a network-wide shuffle of the fact table and a
  * purely local merge.
  */
class BucketingSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  private lazy val spark = SparkTestSession.spark

  test("bucketed tables join with zero shuffle exchanges") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")

    val dir = "/root/testdata/sf0.001"
    Tables.load(spark, dir, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    Tables.load(spark, dir, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")

    // disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val rows = joined.collect()
      assert(rows.map(_.getLong(1)).sum == 6000L)

      val plan = joined.queryExecution.executedPlan
      val shufflesBeforeAgg = collectWithSubqueries(plan) {
        case s: ShuffleExchangeExec => s
      }
      // exactly one shuffle (the groupBy); the join itself is
      // co-located via bucketing
      assert(shufflesBeforeAgg.size == 1,
        s"expected only the aggregation shuffle, got:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
