package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanHelper,
  BroadcastQueryStageExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.{CollectLimitExec, GlobalLimitExec,
  LocalLimitExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec,
  ReusedExchangeExec}

/** Repo-wide enforcement of the q209 lesson (VERDICT r16 "What's
  * wrong" #3): an unpartitioned ordered window funnels its ENTIRE
  * input through one task — correct at fixture scale, the slowest
  * stage in the catalog at 100×. The only legitimate uses are over
  * provably bounded inputs: an aggregate's group cardinality (q104's
  * daily rollup, q209's shard sums) or a limit-truncated list (q125's
  * fusion depth). This spec walks every catalog query's physical plan
  * and fails if any unpartitioned WindowExec consumes anything else —
  * so the next corpus-sized running sum fails `sbt test` instead of
  * shipping as a scale-killer.
  *
  * Boundedness follows only NON-BROADCAST input paths: a broadcast
  * build side cannot launder a corpus-sized probe side (the original
  * q209 spelling had a broadcast 1-row aggregate right next to the
  * unbounded corpus — "any aggregate below" would have passed it).
  */
class GlobalWindowAuditSpec extends AnyFunSuite
    with AdaptiveSparkPlanHelper {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def isBroadcast(p: SparkPlan): Boolean = p match {
    case _: BroadcastExchangeExec => true
    case _: BroadcastQueryStageExec => true
    case r: ReusedExchangeExec => isBroadcast(r.child)
    case _ => false
  }

  /** Output cardinality is bounded (not corpus-order) iff the node is
    * an aggregate/limit, or every non-broadcast input path is.
    */
  private def bounded(p: SparkPlan): Boolean = p match {
    case _: BaseAggregateExec => true
    case _: GlobalLimitExec => true
    case _: LocalLimitExec => true
    case _: CollectLimitExec => true
    case _: TakeOrderedAndProjectExec => true
    case s: InMemoryTableScanExec => bounded(s.relation.cachedPlan)
    case other =>
      val real = other.children.filterNot(isBroadcast)
      real.nonEmpty && real.forall(bounded)
  }

  private def offendersOf(name: String, plan: SparkPlan): Seq[String] =
    collectWithSubqueries(plan) { case w: WindowExec => w }
      .filter(_.partitionSpec.isEmpty)
      .filterNot(w => bounded(w.child))
      .map(w => s"$name (window cols: " +
        s"${w.windowExpression.map(_.name).mkString(",")})")

  test("the audit flags the retired q209 global-window arm (canary)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast(LongType).as("nt"))
    val plan = operators.Sampling.ppsGlobal(d, 40L)
      .queryExecution.executedPlan
    assert(offendersOf("ppsGlobal", plan).nonEmpty,
      "the audit no longer recognizes the corpus-sized global window" +
        " (the exact r16 q209 defect)")
  }

  test("no catalog query funnels an unbounded relation through an " +
      "unpartitioned window; none plans a cartesian product") {
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    val offenders = SparkEntry.defs.flatMap { d =>
      try {
        val plan = d.build(spark, dir).queryExecution.executedPlan
        // a CartesianProductExec is the non-broadcast all-pairs join —
        // corpus² shuffle rows at any scale; the small-corpus arms all
        // go through BroadcastNestedLoopJoin, which stays bounded by
        // the broadcast side (PlanShapeSpec pins those per query)
        val carts = collectWithSubqueries(plan) {
          case c: CartesianProductExec => c
        }.map(_ => s"${d.name} (CartesianProduct)")
        offendersOf(d.name, plan) ++ carts
      } catch {
        case e: Throwable =>
          Seq(s"${d.name} [plan error: " +
            s"${Option(e.getMessage).getOrElse(e.toString).take(80)}]")
      }
    }
    assert(offenders.isEmpty,
      "scale-killer plan shapes (the q209 single-task window class / " +
        s"non-broadcast cartesian): ${offenders.mkString("; ")}")
  }
}
