package graft.tools

import graft.{Sessions, SparkEntry}

/** Per-phase planning cost of an unprepared build: DSL construction
  * (builder call), analysis (trigger analyzed), optimization, physical
  * planning. Hand-run diagnostic.
  */
object PlanCost {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q79_bigram_pmi")
    val spark = Sessions.build("graft-plancost", coresOverride = Some("32"))
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime()-t0)/1e6)
    }
    names.foreach { n =>
      val d = SparkEntry.benchDefs.find(_.name == n).get
      d.build(spark, sfDir).count() // warm everything once
      (1 to 3).foreach { _ =>
        val (df, tBuild) = t(d.build(spark, sfDir))
        val qe = df.queryExecution
        val (_, tAna) = t(qe.analyzed)
        val (_, tOpt) = t(qe.optimizedPlan)
        val (_, tPhy) = t(qe.executedPlan)
        val (_, tRun) = t(df.count())
        println(f"$n build=$tBuild%.0fms analyze=$tAna%.0fms optimize=$tOpt%.0fms physical=$tPhy%.0fms runIncl=$tRun%.0fms")
      }
    }
    spark.stop()
  }
}
