package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted join/aggregation must be result-identical to the plain
  * formulations — only the partitioning changes.
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // 90% of rows share one hot key
    val skewed = spark.range(0, 10000).toDF("id")
      .withColumn("key", when(col("id") % 10 < 9, 1L)
        .otherwise(col("id") % 100))
      .withColumn("payload", col("id") * 2)
    val dim = spark.range(0, 100).toDF("key")
      .withColumn("label", concat(lit("k"), col("key")))

    val plain = skewed.join(dim, "key")
      .select("id", "key", "payload", "label")
    val salted = Skew.saltedJoin(skewed, dim, "key", salts = 8)
      .select("id", "key", "payload", "label")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty &&
      plain.exceptAll(salted).isEmpty)
  }

  test("salted count equals plain groupBy count") {
    val skewed = spark.range(0, 5000).toDF("id")
      .withColumn("key", when(col("id") % 5 < 4, 7L).otherwise(col("id") % 3))
    val plain = skewed.groupBy("key").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val salted = Skew.saltedCount(skewed, "key", salts = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(salted == plain)
  }

  test("AQE skew-join splits the hot partition at runtime (the " +
      "no-salt path the 100 TB posture leans on first)") {
    import spark.implicits._
    // One key carries ~95% of a 200k-row fact side. With the skew-join
    // thresholds lowered to fixture scale, AQE must detect the hot
    // post-shuffle partition and split it into multiple tasks — the
    // runtime re-plan that makes manual salting (above) the FALLBACK,
    // not the default, on a real cluster.
    val prev = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "64KB")
      spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      // force a shuffle join: a broadcast has no skew to split
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val fact = spark.range(0, 200000).toDF("id")
        .withColumn("key", when(col("id") % 20 < 19, 1L)
          .otherwise(col("id") % 500))
        .withColumn("payload",
          concat(lit("p"), col("id"), lit("x" * 40)))
      val dim = spark.range(0, 500).toDF("key")
        .withColumn("label", concat(lit("k"), col("key")))
      val joined = fact.join(dim.hint("shuffle_hash"), "key")
      // drive THIS queryExecution (count() would plan a separate one)
      var n = 0L
      joined.toLocalIterator().forEachRemaining(_ => n += 1)
      assert(n == 200000L)
      val plan = joined.queryExecution.executedPlan.toString
      // AQE marks the re-planned join and its skew-split shuffle read
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.toLowerCase.contains("skew"),
        s"no skew handling in the final plan:\n${plan.take(2000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
