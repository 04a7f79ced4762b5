package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line with per-query seconds over the
  * headline query set (QueryDef.bench) at SPARK_GRAFT_SF_DIR.
  *
  * Two timing surfaces, reported side by side so fixed per-query
  * overhead and steady-state compute separate cleanly:
  *
  *  - cold: the FIRST execution of each plan in this JVM — pays codegen
  *    compilation, file listing, JIT warmup (`queries_cold` /
  *    `cold_total`);
  *  - warm: best of 3 subsequent runs — steady-state plan execution,
  *    the number that tracks real compute (`queries` / `value`).
  *
  * Warm samples come from 3 back-to-back runs per query PLUS one final
  * round-robin sweep over the whole set; the minimum over all four
  * counts. Back-to-back runs measure peak steady state (JIT, codegen
  * classes and footer caches stay CPU-cache-hot between runs — a fully
  * interleaved schedule measured 10–40% slower on identical plans).
  * The extra sweep runs minutes later, so a transient host-load spike
  * that happened to cover one query's back-to-back triple no longer
  * defines its reported time (BENCH_r04's driver run recorded q17 at
  * 3.3 s warm vs 0.47 s on an idle box — exactly this failure mode).
  *
  * Only successful runs compete — a fast failure must not report as a
  * fast query (a query with no successful run reports -1 and is
  * excluded from totals).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.build("graft-bench",
      coresOverride = Some(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    // Optional local-iteration filter (the driver never sets it):
    // bench only queries whose name contains any given substring.
    val defs = sys.env.get("SPARK_GRAFT_BENCH_FILTER") match {
      case Some(pats) =>
        val ps = pats.split(",").toSeq
        SparkEntry.benchDefs.filter(d => ps.exists(d.name.contains))
      case None => SparkEntry.benchDefs
    }

    // one timed execution; count() drains the whole plan
    def run(d: QueryDef): Option[Double] = {
      val t0 = System.nanoTime()
      try { d.build(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
      catch { case _: Throwable => None }
    }

    val cold = defs.map(d => d.name -> run(d).getOrElse(-1.0))
    val backToBack = defs.map(d => (1 to 3).flatMap(_ => run(d)))
    val sweep = defs.map(d => run(d))
    val warm = defs.zipWithIndex.map { case (d, i) =>
      val times = backToBack(i) ++ sweep(i)
      d.name -> (if (times.nonEmpty) times.min else -1.0)
    }

    def jsonMap(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    def total(kvs: Seq[(String, Double)]): Double =
      kvs.map(_._2).filter(_ >= 0).sum

    println(s"""{"metric":"total","value":${total(warm)},"unit":"sec",""" +
      s""""queries":${jsonMap(warm)},""" +
      s""""cold_total":${total(cold)},"queries_cold":${jsonMap(cold)},""" +
      s""""sf":"$sfDir"}""")
    Caches.clear(spark)
    spark.stop()
  }
}
