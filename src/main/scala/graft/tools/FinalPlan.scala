package graft.tools

import org.apache.spark.sql.functions._

/** Measurement-only main (guide §1/§7.2): executes named catalog
  * queries under the SAME per-query profile Bench.setProfile applies
  * (lowLatency ⇒ AQE off + 8 shuffle partitions), then prints the
  * POST-EXECUTION plan — with AQE on this is the final re-optimized
  * plan including ReusedExchange/AQEShuffleRead nodes, which the
  * pre-execution `explain` cannot show — plus the StageClock stage/job
  * receipts of the warm run. Not part of the driver contract.
  *
  * usage: runMain graft.tools.FinalPlan <sfDir> <query> [query...]
  */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: FinalPlan <sfDir> <query>...")
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val spark = graft.Sessions.build("graft-finalplan",
      coresOverride = Some(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    val clock = new graft.StageClock
    spark.sparkContext.addSparkListener(clock)
    val aqeDefault = spark.conf.get("spark.sql.adaptive.enabled")
    val shuffleDefault = spark.conf.get("spark.sql.shuffle.partitions")
    val defByName = graft.SparkEntry.defs.map(d => d.name -> d).toMap
    names.foreach { n =>
      val d = defByName.getOrElse(n, sys.error(
        s"FinalPlan: unknown query '$n' — usage: FinalPlan <sfDir> " +
          "<query>... (names come from SparkEntry.defs)"))
      val aqe = if (d.lowLatency) "false" else aqeDefault
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", aqe)
      spark.conf.set("spark.sql.shuffle.partitions",
        if (d.lowLatency) "8" else shuffleDefault)
      val df = d.build(spark, sfDir)
      df.count() // cold: materializes persists, compiles codegen
      clock.quiesce(); clock.reset()
      val t0 = System.nanoTime()
      val cnt = df.count() // warm run — what Bench times
      val wall = (System.nanoTime() - t0) / 1e9
      clock.quiesce()
      val (st, task, cpu, sw) = clock.snapshot()
      println(s"\n========== $n ==========")
      println(f"warm_wall=$wall%.3f rows=$cnt stages=$st " +
        f"jobs=${clock.jobs} task_sec=$task%.3f cpu_sec=$cpu%.3f " +
        f"stage_wall=$sw%.3f")
      // count()'s own execution is what Bench times; print ITS final
      // plan (post-AQE) via a fresh count-shaped execution. NOTE: this
      // is a THIRD, separate execution — AQE's runtime decisions are
      // not guaranteed identical to the timed warm run's (they usually
      // are at a fixed SF; treat deltas as a flag, not ground truth).
      val qe = df.groupBy().count().queryExecution
      qe.executedPlan.executeCollect()
      println(qe.executedPlan.toString)
    }
    spark.stop()
  }
}
