package graft.tools

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec

/** Measurement-only main (guide §1; r20 VERDICT ask #6): executes a
  * catalog query and prints every aggregate operator's observed
  * input → output row counts from the executed plan's SQL metrics —
  * the partial-aggregation reduction-ratio receipt (is the map-side
  * partial earning the width of its exchange?).
  *
  * usage: runMain graft.tools.PreAggReceipt <sfDir> <query> [query...]
  */
object PreAggReceipt extends AdaptiveSparkPlanHelper {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PreAggReceipt <sfDir> <query>...")
    val sfDir = args(0)
    val spark = graft.Sessions.build("graft-preagg",
      coresOverride = Some(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { n =>
      val d = graft.SparkEntry.defs.find(_.name == n).getOrElse(
        sys.error(s"unknown query '$n'"))
      val df = d.build(spark, sfDir)
      // execute THIS QueryExecution (count() would spawn its own and
      // leave these metrics untouched); outputs are ≤ a few hundred
      // rows for every catalog entry
      df.collect()
      println(s"\n========== $n ==========")
      collectWithSubqueries(df.queryExecution.executedPlan) {
        case a: BaseAggregateExec => a
      }.foreach { a =>
        val out = a.metrics.get("numOutputRows").map(_.value)
        val in = a.children.headOption.flatMap(
          _.metrics.get("numOutputRows")).map(_.value)
        println(f"${a.nodeName}%-28s keys=${a.groupingExpressions
          .map(_.sql).mkString(",").take(60)}%-62s " +
          s"in=${in.getOrElse(-1L)} out=${out.getOrElse(-1L)}")
      }
    }
    spark.stop()
  }
}
