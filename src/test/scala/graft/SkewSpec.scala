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
}
