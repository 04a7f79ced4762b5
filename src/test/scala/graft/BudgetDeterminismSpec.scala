package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r12 µunit-budget fix (q115/q147/q153): the α=0.5
  * temperature take must be a pure function of the per-key counts —
  * independent of partitioning, aggregation order, and engine. The
  * old double spelling (floor(budget·√n/Σ√n)) failed exactly this on
  * the sf0.1 sweep: with tied per-source counts the product sits
  * EXACTLY on an integer and the summation order of Σ√n decides the
  * floor. Here the same takes are computed under adversarial
  * partitionings and against an exact BigDecimal reference.
  */
class BudgetDeterminismSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def takesOf(counts: DataFrame): Map[String, Long] = {
    val c = counts
      .withColumn("wu",
        floor(sqrt(col("cnt").cast(DoubleType)) * 1e6 + 0.5d)
          .cast("long"))
    val k = c.agg(sum(col("wu")).as("swu"), sum(col("cnt")).as("total"))
    c.crossJoin(broadcast(k))
      .select(col("key"),
        least(col("cnt"), expr("((total div 2) * wu) div swu"))
          .as("take"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("tied counts (the sf0.1 flake shape): identical takes under " +
      "1/3/7/32 partitions, matching the exact integer reference") {
    import spark.implicits._
    // 20 keys with IDENTICAL counts — the boundary case: budget·w/sw
    // is exactly total/2/20 in real arithmetic
    val tied = (0 until 20).map(k => (s"k$k", 250L))
    for (parts <- Seq(1, 3, 7, 32)) {
      val takes = takesOf(tied.toDF("key", "cnt").repartition(parts))
      assert(takes.values.toSet === Set(125L),
        s"parts=$parts: tied counts must take exactly 2500/20 each, " +
          s"got ${takes.values.toSet}")
    }
  }

  test("skewed counts: takes invariant across partitionings and " +
      "equal to the BigDecimal reference") {
    import spark.implicits._
    val skewed = Seq(("a", 1L), ("b", 7L), ("c", 100L), ("d", 1000L),
      ("e", 997L), ("f", 31L), ("g", 250L), ("h", 250L))
    // exact reference: wu_i = round(√n_i·1e6) via BigDecimal on the
    // same correctly-rounded double sqrt, then pure integer math
    val wu = skewed.map { case (k, n) =>
      k -> BigDecimal(math.sqrt(n.toDouble) * 1e6 + 0.5)
        .setScale(0, BigDecimal.RoundingMode.FLOOR).toLong
    }.toMap
    val swu = wu.values.sum
    val total = skewed.map(_._2).sum
    val expect = skewed.map { case (k, n) =>
      k -> math.min(n, (total / 2) * wu(k) / swu)
    }.toMap
    val reference = takesOf(skewed.toDF("key", "cnt"))
    assert(reference === expect)
    for (parts <- Seq(2, 5, 16)) {
      assert(takesOf(skewed.toDF("key", "cnt").repartition(parts))
        === expect, s"parts=$parts diverged")
    }
  }
}
