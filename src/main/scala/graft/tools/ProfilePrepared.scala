package graft.tools

import graft.{Sessions, SparkEntry}
import org.apache.spark.sql.GraftShims

/** Scratch comparator for Bench's prepared-plan reuse: fresh DSL build
  * per run vs re-binding the once-optimized logical plan. Prints warm
  * walls for both paths and flags executed-plan differences. Hand-run;
  * not a driver contract.
  */
object ProfilePrepared {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q20_dedup_keyed")
    val spark = Sessions.build("graft-prep", coresOverride = Some("32"))
    spark.sparkContext.setLogLevel("ERROR")

    def wall(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    names.foreach { n =>
      val d = SparkEntry.benchDefs.find(_.name == n).get
      val first = d.build(spark, sfDir)
      first.count() // cold
      val opt = first.queryExecution.optimizedPlan
      val freshWalls = (1 to 3).map(_ => wall(d.build(spark, sfDir).count()))
      val prepWalls = (1 to 3).map(_ =>
        wall(GraftShims.ofRows(spark, opt).count()))
      println(f"$n fresh min ${freshWalls.min}%.3f  prepared min ${prepWalls.min}%.3f")
      val pf = d.build(spark, sfDir).queryExecution.executedPlan.toString
      val pp = GraftShims.ofRows(spark, opt).queryExecution.executedPlan.toString
      def shape(s: String): String = s.linesIterator
        .map(_.replaceAll("#\\d+L?", "#x").trim)
        .filter(l => l.startsWith("+-") || l.startsWith(":") || l.startsWith("*"))
        .mkString("\n")
      if (shape(pf) == shape(pp)) println(s"$n executed-plan shapes MATCH")
      else {
        println(s"$n executed-plan shapes DIFFER")
        println("---- fresh ----\n" + pf.take(3000))
        println("---- prepared ----\n" + pp.take(3000))
      }
    }
    graft.Caches.clear(spark)
    spark.stop()
  }
}
