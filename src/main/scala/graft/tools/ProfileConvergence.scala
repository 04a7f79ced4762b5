package graft.tools

import graft.Sessions

/** Measured evidence for q208's PRODUCTION arm
  * ([[graft.operators.Graph.ranksToConvergence]]): the catalog/bench
  * entry pins the fixed 5-round recurrence (an oracle needs a pure
  * function of the data), so the ~90-round convergence arm's
  * per-round cost and its released-checkpoint storage claim would
  * otherwise be asserted, never measured. Run by hand; the numbers
  * land in BENCH_NOTES.md.
  *
  * Runs under the interactive profile (AQE off — the q208 bench
  * profile: fixed-topology iterative plans pay an AQE
  * stage-materialization job floor per round and re-plan nothing).
  */
object ProfileConvergence {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.build("graft-convergence",
      coresOverride = Some("32"))
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    val ew = graft.operators.Graph.edges(spark, sfDir)
    val edgeRows = ew.count() // materialize the loop-invariant side
    val rddsBefore = spark.sparkContext.getPersistentRDDs.size

    val t0 = System.nanoTime()
    val (r, rounds) = graft.operators.Graph.ranksToConvergence(ew)
    val nodes = r.count()
    val wallSec = (System.nanoTime() - t0) / 1e9

    // storage claim: superseded round checkpoints + the per-call nodes
    // cache are released; only the returned vector's block may remain
    Thread.sleep(500) // non-blocking unpersists drain async
    val rddsAfter = spark.sparkContext.getPersistentRDDs.size
    val cached = spark.sparkContext.getRDDStorageInfo
      .map(i => s"${i.name.take(40)} mem=${i.memSize / 1024}KiB")
      .mkString("; ")

    println(f"""{"metric":"q208_convergence","sf":"$sfDir",""" +
      f""""edge_rows":$edgeRows,"nodes":$nodes,"rounds":$rounds,""" +
      f""""wall_sec":$wallSec%.2f,""" +
      f""""wall_per_round_ms":${wallSec * 1000 / rounds}%.1f,""" +
      f""""rdds_before":$rddsBefore,"rdds_after":$rddsAfter}""")
    println(s"cached after run: $cached")
    spark.stop()
  }
}
