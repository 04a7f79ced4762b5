package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Measurement-only main (guide §1): INTERLEAVED A/B of the q20 keyed-
  * dedup aggregation spellings — (A) struct-ordered min_by, which
  * plans as SortAggregate (immutable buffer), vs (B) the r21 packed
  * Decimal(38,0) ordering, which plans as HashAggregate. Interleaving
  * the runs makes the RATIO robust to the co-tenant load bands this
  * box carries; medians reported. Not part of the driver contract.
  *
  * usage: runMain graft.tools.MinByAb [sfDir] [iters]
  */
object MinByAb {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val iters = if (args.length > 1) args(1).toInt else 7
    val spark = graft.Sessions.build("graft-minby-ab",
      coresOverride = Some(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    val clock = new graft.StageClock
    spark.sparkContext.addSparkListener(clock)

    val e = graft.Tables.load(spark, sfDir, "events")

    def structSpelling() =
      e.groupBy(col("user_id"), col("event_type"))
        .agg(min_by(col("event_id"),
          struct(unix_millis(col("ts")).as("ems"),
            col("event_id").as("eid"))).as("first_event"))

    def packedSpelling() = {
      val ord = unix_millis(col("ts")).cast(DecimalType(38, 0)) *
        lit(BigDecimal(2).pow(63)) +
        col("event_id").cast(DecimalType(38, 0))
      e.groupBy(col("user_id"), col("event_type"))
        .agg(min_by(col("event_id"), ord).as("first_event"))
    }

    def time(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      clock.quiesce(); clock.reset()
      val t0 = System.nanoTime()
      df.groupBy().count().queryExecution.executedPlan
        .executeCollect().head.getLong(0)
      val wall = (System.nanoTime() - t0) / 1e9
      clock.quiesce()
      val (_, task, _, _) = clock.snapshot()
      (wall, task)
    }

    // one cold pass each (codegen compile), then interleaved samples
    time(structSpelling()); time(packedSpelling())
    val a = Array.fill(iters)((0.0, 0.0))
    val b = Array.fill(iters)((0.0, 0.0))
    (0 until iters).foreach { i =>
      a(i) = time(structSpelling())
      b(i) = time(packedSpelling())
    }
    def med(xs: Array[Double]): Double = xs.sorted.apply(xs.length / 2)
    println(f"struct(SortAgg)  wall_med=${med(a.map(_._1))}%.4f " +
      f"task_med=${med(a.map(_._2))}%.4f " +
      s"walls=${a.map(x => f"${x._1}%.3f").mkString(",")}")
    println(f"packed(HashAgg)  wall_med=${med(b.map(_._1))}%.4f " +
      f"task_med=${med(b.map(_._2))}%.4f " +
      s"walls=${b.map(x => f"${x._1}%.3f").mkString(",")}")
    // sanity: identical results
    val ar = structSpelling().orderBy("user_id", "event_type").collect()
    val br = packedSpelling().orderBy("user_id", "event_type").collect()
    require(ar.sameElements(br), "spellings disagree!")
    println(s"results identical over ${ar.length} groups")
    spark.stop()
  }
}
