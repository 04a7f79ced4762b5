package graft.tools

import graft.{Sessions, SparkEntry}

/** Scratch profiler for the fixed per-query floor on the sub-second
  * bench tier — splits each warm run into Dataset build + analysis,
  * optimize+physical planning, and execution, plus micro-benchmarks of
  * the bare job-launch cost. Run by hand while tuning; not part of the
  * driver contract.
  */
object ProfileFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q83_funnel", "q04_join3", "q17_join_agg", "q45_ann_ivf",
        "q79_bigram_pmi", "q68_tfidf")
    val spark = Sessions.build("graft-floor", coresOverride = Some("32"))
    spark.sparkContext.setLogLevel("ERROR")

    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6

    // bare job floor: empty-ish jobs, warm
    for (_ <- 1 to 3) spark.range(1).count()
    val tR = System.nanoTime(); spark.range(1).count()
    println(f"range(1).count warm:        ${ms(tR)}%8.1f ms")
    val one = spark.range(100).repartition(16)
    one.count(); one.count()
    val tS = System.nanoTime()
    spark.range(100).repartition(16).count()
    println(f"1-shuffle job warm:         ${ms(tS)}%8.1f ms")

    names.foreach { n =>
      val d = SparkEntry.benchDefs.find(_.name == n)
        .getOrElse(sys.error(s"no bench def $n"))
      // warm everything once
      d.build(spark, sfDir).count()
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val df = d.build(spark, sfDir)
        val tBuild = ms(t0)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // analysis+optimize+physical
        val tPlan = ms(t1)
        val t2 = System.nanoTime()
        df.count()
        val tExec = ms(t2)
        println(f"$n%-22s run$i  build+analyze $tBuild%7.1f ms   " +
          f"plan $tPlan%7.1f ms   exec $tExec%7.1f ms")
      }
    }
    graft.Caches.clear(spark)
    spark.stop()
  }
}
